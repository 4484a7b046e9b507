"""QAT / PTQ training CLI — rebuild of
``classification/train_quantization.py`` (torchvision QAT recipe: int8
fake-quant with observer freeze after N epochs and BN freeze after M
epochs; post-training quantization; per-epoch eval of the QAT model and —
since our fake-quant numerics equal int8-dequant — the converted model).

Usage::

    python -m iif_tpu.cli.train_quantization --dset_name synthetic \
        --model resnet18 --epochs 6 --qat-freeze-observer 4 --qat-freeze-bn 2
"""
from __future__ import annotations

import argparse


def get_args_parser():
    from iif_tpu.cli.train import get_args_parser as base_parser

    parser = argparse.ArgumentParser(parents=[base_parser(add_help=False)],
                                     description="QAT training")
    parser.add_argument("--qat-freeze-observer", default=4, type=int,
                        help="freeze weight-scale observers from this epoch")
    parser.add_argument("--qat-freeze-bn", default=2, type=int,
                        help="freeze BN statistics from this epoch")
    parser.add_argument("--post-training-quantize", action="store_true",
                        help="no QAT: evaluate int8 quantization of loaded "
                             "weights (--load_from)")
    parser.add_argument("--num-calibration-batches", default=32, type=int)
    return parser


def main(args):
    from iif_tpu.utils.compile_cache import enable as _enable_xla_cache
    _enable_xla_cache()

    from iif_tpu.cli import train as train_cli
    from iif_tpu.quant import QatConfig

    qat = QatConfig(enabled=True,
                    freeze_observer_epoch=args.qat_freeze_observer,
                    freeze_bn_epoch=args.qat_freeze_bn)
    if args.post_training_quantize:
        # PTQ: weights are loaded via --load_from; evaluation of the
        # int8-converted model (fake-quant == int8-dequant numerics).
        args.test_only = True
    return train_cli.main(args, qat=qat)


if __name__ == "__main__":
    main(get_args_parser().parse_args())
