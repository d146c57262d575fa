from tpu_se.infer.decode import Enhancer, enhance_utterance, decode_files

__all__ = ["Enhancer", "enhance_utterance", "decode_files"]
