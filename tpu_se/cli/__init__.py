"""Command-line entry points mirroring the reference's four layer CLIs
(Wav2LPS_be, feacat/qnnorm, BPtrain_Sigmoid + finetune.pl, decode.m +
LPS2Wav_be).  Run ``python -m tpu_se <command> --help``."""
