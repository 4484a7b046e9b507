"""Registry + config-dict instantiation.

TPU-native replacement for the mmcv registry/builder machinery the reference
rides on (reference: ``instance_segmentation/mmdet/models/builder.py``,
``mmdet/datasets/builder.py:24-25``) — a plain string->callable map with
``build_from_cfg(dict(type='Name', ...))`` semantics so mmdet-style config
dicts keep working, without any torch/mmcv dependency.
"""
from __future__ import annotations

import inspect
from typing import Any, Callable, Dict, Optional


class Registry:
    """A name -> class/function registry.

    Usage::

        MODELS = Registry('models')

        @MODELS.register()
        class ResNet: ...

        model = MODELS.build(dict(type='ResNet', depth=50))
    """

    def __init__(self, name: str):
        self.name = name
        self._module_dict: Dict[str, Callable] = {}

    def __contains__(self, key: str) -> bool:
        return key in self._module_dict

    def __repr__(self) -> str:
        return f"Registry(name={self.name}, items={sorted(self._module_dict)})"

    def keys(self):
        return self._module_dict.keys()

    def get(self, key: str) -> Optional[Callable]:
        return self._module_dict.get(key)

    def register(self, name: Optional[str] = None, *, module: Optional[Callable] = None):
        """Register a class/function, usable as decorator or direct call."""
        if module is not None:
            self._register(module, name)
            return module

        def _decorator(cls):
            self._register(cls, name)
            return cls

        return _decorator

    # mmcv-compatible alias
    register_module = register

    def _register(self, module: Callable, name: Optional[str] = None):
        key = name or module.__name__
        if key in self._module_dict and self._module_dict[key] is not module:
            raise KeyError(f"{key} is already registered in {self.name}")
        self._module_dict[key] = module

    def build(self, cfg: Dict[str, Any], **default_kwargs) -> Any:
        return build_from_cfg(cfg, self, **default_kwargs)


def build_from_cfg(cfg: Dict[str, Any], registry: Registry, **default_kwargs) -> Any:
    """Instantiate ``registry[cfg['type']](**cfg_without_type)``.

    Mirrors mmcv's ``build_from_cfg`` contract (reference config dicts like
    ``dict(type='IIFLoss', variant='raw')`` — e.g.
    ``experiments/iif/iif_r50_4x4_1x/iif_r50_4x4_1x.py:52-56``).
    """
    if not isinstance(cfg, dict) or "type" not in cfg:
        raise TypeError(f"cfg must be a dict with a 'type' key, got {cfg!r}")
    args = dict(cfg)
    obj_type = args.pop("type")
    if isinstance(obj_type, str):
        obj_cls = registry.get(obj_type)
        if obj_cls is None:
            raise KeyError(f"{obj_type} is not registered in {registry.name}; "
                           f"known: {sorted(registry.keys())}")
    elif inspect.isclass(obj_type) or inspect.isfunction(obj_type):
        obj_cls = obj_type
    else:
        raise TypeError(f"type must be a str or class, got {type(obj_type)}")
    for k, v in default_kwargs.items():
        args.setdefault(k, v)
    return obj_cls(**args)


# Global registries (mirroring the reference's mmdet registry taxonomy).
MODELS = Registry("models")
BACKBONES = Registry("backbones")
NECKS = Registry("necks")
HEADS = Registry("heads")
LOSSES = Registry("losses")
DETECTORS = Registry("detectors")
DATASETS = Registry("datasets")
PIPELINES = Registry("pipelines")
SAMPLERS = Registry("samplers")
