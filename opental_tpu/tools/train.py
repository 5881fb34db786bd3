"""Training CLI: python -m opental_tpu.tools.train <cfg.yaml> [flags].

Command-surface parity with the reference entry
(`python AFSD/thumos14/train.py <cfg>`, AFSD/thumos14/train.py:306-363).
"""

from __future__ import annotations

from opental_tpu.config import config_from_args
from opental_tpu.train.loop import train


def main(argv=None) -> None:
    cfg = config_from_args(argv)
    tr = cfg.training
    print('batch size: ', tr.get('batch_size'))
    print('learning rate: ', tr.get('learning_rate'))
    print('weight decay: ', tr.get('weight_decay'))
    print('max epoch: ', tr.get('max_epoch'))
    print('checkpoint path: ', tr.get('checkpoint_path'))
    print('loc weight: ', tr.get('lw'))
    print('cls weight: ', tr.get('cw'))
    print('ctr weight: ', tr.get('ctw'))
    print('ssl weight: ', tr.get('ssl'))
    print('piou:', tr.get('piou'))
    print('resume: ', tr.get('resume'))
    train(cfg)


if __name__ == '__main__':
    main()
