"""Training CLI: python -m opental_tpu.tools.train <cfg.yaml> [flags].

Command-surface parity with the reference entry
(`python AFSD/thumos14/train.py <cfg>`, AFSD/thumos14/train.py:306-363).
"""

from __future__ import annotations

from opental_tpu.config import build_arg_parser, config_from_namespace
from opental_tpu.train.loop import train


def main(argv=None) -> None:
    parser = build_arg_parser()
    # smoke-run bound (no reference analog; 0 = full epochs)
    parser.add_argument('--max_steps_per_epoch', type=int, default=None)
    args = parser.parse_args(argv)
    cfg = config_from_namespace(args)
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
    print('use_mesh: ', tr.get('use_mesh', False))
    train(cfg, max_steps_per_epoch=args.max_steps_per_epoch)


if __name__ == '__main__':
    main()
