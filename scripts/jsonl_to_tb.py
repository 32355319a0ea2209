"""Convert a metrics.jsonl (clipspm_tpu.utils.metrics.MetricsWriter output)
into TensorBoard event files.

Usage:
    python scripts/jsonl_to_tb.py <metrics.jsonl> <tb_out_dir>
"""

import sys

from clipspm_tpu.utils.metrics import jsonl_to_tensorboard


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 2:
        print(__doc__)
        return 2
    n = jsonl_to_tensorboard(argv[0], argv[1])
    print(f"wrote {n} scalars to {argv[1]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
