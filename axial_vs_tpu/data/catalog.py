"""Dataset + metadata catalogs (replaces detectron2 DatasetCatalog/
MetadataCatalog and the mmdet DATASETS registry)."""
from __future__ import annotations

from typing import Callable


class _DatasetCatalog:
    def __init__(self):
        self._registry: dict[str, Callable] = {}

    def register(self, name: str, fn: Callable):
        if name in self._registry:
            raise KeyError(f"dataset {name!r} already registered")
        self._registry[name] = fn

    def get(self, name: str):
        return self._registry[name]()

    def list(self):
        return sorted(self._registry)

    def pop(self, name: str):
        return self._registry.pop(name)

    def __contains__(self, name):
        return name in self._registry


class _Metadata(dict):
    __getattr__ = dict.__getitem__

    def __setattr__(self, k, v):
        self[k] = v


class _MetadataCatalog:
    def __init__(self):
        self._meta: dict[str, _Metadata] = {}

    def get(self, name: str) -> _Metadata:
        return self._meta.setdefault(name, _Metadata())


DatasetCatalog = _DatasetCatalog()
MetadataCatalog = _MetadataCatalog()
