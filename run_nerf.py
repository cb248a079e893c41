#!/usr/bin/env python
"""Training CLI (equivalent of reference run_nerf.py).

Usage:
  python run_nerf.py --config configs/surreal/surreal.txt [--flag value ...]
"""
import sys


def main(argv=None):
    from anerf_tpu.config import load_config
    from anerf_tpu.train.loop import train
    from anerf_tpu.utils.device_lock import acquire

    acquire()   # serialize tunnel clients BEFORE the first backend touch
    args = load_config(argv if argv is not None else sys.argv[1:])
    print(f'experiment: {args.expname} -> {args.basedir}')
    train(args)


if __name__ == '__main__':
    main()
