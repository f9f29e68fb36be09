"""Minimal name->constructor registry (replaces detectron2/mmcv registries)."""
from __future__ import annotations

from typing import Callable


class Registry:
    def __init__(self, name: str):
        self._name = name
        self._map: dict[str, Callable] = {}

    def register(self, name: str | None = None):
        def deco(fn_or_cls):
            key = name or fn_or_cls.__name__
            if key in self._map:
                raise KeyError(f"{key!r} already registered in {self._name}")
            self._map[key] = fn_or_cls
            return fn_or_cls

        return deco

    def get(self, name: str) -> Callable:
        if name not in self._map:
            raise KeyError(
                f"{name!r} not found in registry {self._name}. "
                f"Available: {sorted(self._map)}"
            )
        return self._map[name]

    def __contains__(self, name: str) -> bool:
        return name in self._map

    def keys(self):
        return self._map.keys()
