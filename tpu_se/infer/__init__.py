from tpu_se.infer.decode import Enhancer, enhance_utterance, decode_files
from tpu_se.infer.evaluate import score_files, score_pair
from tpu_se.infer.pesq import pesq
from tpu_se.infer.stoi import stoi, pesq_score
from tpu_se.infer.streaming import StreamingEnhancer

__all__ = ["Enhancer", "enhance_utterance", "decode_files",
           "pesq", "stoi", "pesq_score", "StreamingEnhancer",
           "score_pair", "score_files"]
