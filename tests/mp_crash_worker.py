"""Test worker: run the `tpu_se train` CLI, hard-killing the process after
N train_chunk dispatches (TPU_SE_CRASH_AFTER_CHUNKS env var).

``os._exit`` skips every Python-level cleanup — atexit hooks, finally
blocks, buffered writes — so this is SIGKILL-equivalent from the
checkpointing code's point of view: whatever partial-checkpoint files were
mid-write stay exactly as the OS left them.  Used by
tests/test_distributed.py to pin multi-host mid-epoch kill+resume
(the reference's restartability contract, ``finetune.pl:49``, extended to
chunk granularity).
"""

import os
import sys

n_target = int(os.environ.get("TPU_SE_CRASH_AFTER_CHUNKS", "0"))
if n_target:
    import tpu_se.train.loop as loop_mod

    orig = loop_mod.train_chunk
    count = {"n": 0}

    def bomb(*a, **k):
        count["n"] += 1
        if count["n"] > n_target:
            os._exit(7)
        return orig(*a, **k)

    loop_mod.train_chunk = bomb

from tpu_se.cli.main import main  # noqa: E402

sys.exit(main())
