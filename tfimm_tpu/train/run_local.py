"""CLI entry point (reference: tfimm/train/run_local.py:1-13).

Usage: python -m tfimm_tpu.train.run_local --trainer_class=Trainer ...
"""

from tfimm_tpu.train.train import run


def main():
    run(cfg={}, parse_cmdline_args=True)


if __name__ == "__main__":
    main()
