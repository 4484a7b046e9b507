"""TEST ORACLE — transcription of the reference's legacy-checkpoint
channel transforms (``tools/model_converters/upgrade_model_version.py``,
functions ``reorder_cls_channel``/``truncate_cls_channel``/
``truncate_reg_channel``) used ONLY to differentially test
``iif_tpu.cli.convert_model``'s numpy implementations. Not part of the
framework; lives under tests/ like the cocoeval/geometry oracles.
"""
import torch


def reorder_cls_channel(val, num_classes=81):
    if val.dim() == 1:
        new_val = torch.cat((val[1:], val[:1]), dim=0)
    else:
        out_channels, in_channels = val.shape[:2]
        if out_channels != num_classes and out_channels % num_classes == 0:
            new_val = val.reshape(-1, num_classes, in_channels,
                                  *val.shape[2:])
            new_val = torch.cat((new_val[:, 1:], new_val[:, :1]), dim=1)
            new_val = new_val.reshape(val.size())
        elif out_channels == num_classes:
            new_val = torch.cat((val[1:], val[:1]), dim=0)
        else:
            new_val = val
    return new_val


def truncate_cls_channel(val, num_classes=81):
    if val.dim() == 1:
        if val.size(0) % num_classes == 0:
            new_val = val[:num_classes - 1]
        else:
            new_val = val
    else:
        out_channels, in_channels = val.shape[:2]
        if out_channels % num_classes == 0:
            new_val = val.reshape(num_classes, in_channels,
                                  *val.shape[2:])[1:]
            new_val = new_val.reshape(-1, *val.shape[1:])
        else:
            new_val = val
    return new_val


def truncate_reg_channel(val, num_classes=81):
    if val.dim() == 1:
        if val.size(0) % num_classes == 0:
            new_val = val.reshape(num_classes, -1)[:num_classes - 1]
            new_val = new_val.reshape(-1)
        else:
            new_val = val
    else:
        out_channels, in_channels = val.shape[:2]
        if out_channels % num_classes == 0:
            new_val = val.reshape(num_classes, -1, in_channels,
                                  *val.shape[2:])[1:]
            new_val = new_val.reshape(-1, *val.shape[1:])
        else:
            new_val = val
    return new_val
