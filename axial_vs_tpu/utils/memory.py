"""OOM fallback helper — the TPU analogue of the reference's
``retry_if_cuda_oom`` (`kmax_deeplab/utils/memory.py` /
`tube_link_vis/memory.py:11-79`): retry a jax computation on host (CPU
backend) when the device raises RESOURCE_EXHAUSTED."""
from __future__ import annotations

import functools
import logging

import jax

logger = logging.getLogger(__name__)


def _is_oom(err: Exception) -> bool:
    msg = str(err)
    return "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg


def retry_if_oom(fn):
    """Call fn; on device OOM, retry once with inputs moved to the CPU
    backend (post-processing is cheap enough to run on host)."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except Exception as e:  # jaxlib.XlaRuntimeError subclasses vary
            if not _is_oom(e):
                raise
            logger.warning("device OOM in %s; retrying on CPU", fn.__name__)
            cpu = jax.devices("cpu")[0]
            args = jax.tree.map(
                lambda x: jax.device_put(x, cpu) if hasattr(x, "dtype") else x, args
            )
            kwargs = jax.tree.map(
                lambda x: jax.device_put(x, cpu) if hasattr(x, "dtype") else x, kwargs
            )
            with jax.default_device(cpu):
                return fn(*args, **kwargs)

    return wrapped
