"""Checkpoint test driver (working version of the reference's broken
test_iq.py — reference test_iq.py:71 calls load_from_checkpoint with no
path; the intent is: load a checkpoint, run the test split, print NLG
scores).

    python -m blt_vqg_tpu.cli.test_iq --model-dir runs/default [--dataset ...]
"""

from __future__ import annotations

import sys

from blt_vqg_tpu.cli.evaluate_iq import main as evaluate_main


def main(argv=None):
    # test == standalone eval on the held-out split; identical machinery
    return evaluate_main(argv)


if __name__ == "__main__":
    sys.exit(main())
