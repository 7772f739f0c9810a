"""lanemapping_tpu — TPU-native large-scale lane mapping from MLS point clouds.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of
WHU-USI3DV/LaneMapping (see /root/repo/SURVEY.md for the component map).
"""

import os as _os

if "JAX_PLATFORMS" in _os.environ:
    # The axon TPU sitecustomize overrides JAX_PLATFORMS through jax.config
    # at interpreter start; re-assert the user's env choice (e.g. cpu) here,
    # before any backend initialises.
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

def _tpu_like_platform() -> bool:
    """True only when a TPU-ish backend is actually requested — via the env
    var or an already-applied ``jax_platforms`` config (the axon
    sitecustomize sets the latter with the env unset).  A plain dev box with
    neither set resolves to the CPU backend, where the cache must stay off:
    local CPU compiles are cheap and we must not pay the SIGILL risk below
    for nothing.  String checks only — probing ``jax.default_backend()``
    here would initialise backends at import time."""
    plats = _os.environ.get("JAX_PLATFORMS", "")
    if not plats:
        try:
            import jax as _jax
            plats = _jax.config.jax_platforms or ""
        except Exception:
            plats = ""
    if any(p in plats for p in ("tpu", "axon")):
        return True
    if plats:
        return False
    # Platform unset anywhere (stock TPU VM resolving the backend
    # implicitly): treat as TPU when a TPU runtime is importable, so the
    # persistent cache is not silently disabled there.
    import importlib.util as _ilu
    return any(_ilu.find_spec(m) is not None for m in ("libtpu", "libtpu_nightly"))


if not _os.environ.get("LANEMAPPING_NO_COMPILE_CACHE") \
        and _tpu_like_platform():
    # Persistent XLA compilation cache, on by default: the flagship programs
    # take minutes to compile through a remote-TPU tunnel, and every CLI
    # entry point is its own process.  JAX_COMPILATION_CACHE_DIR still wins
    # if the user set it; disable entirely with LANEMAPPING_NO_COMPILE_CACHE=1.
    # Not enabled for the pure-CPU backend: local CPU compiles are cheap and
    # XLA:CPU AOT cache entries are machine-feature-pinned (loading one
    # logs a SIGILL-risk mismatch under virtualised feature detection).
    import jax as _jax

    try:
        _cache = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.join(_os.path.expanduser("~"), ".cache",
                          "lanemapping_tpu", "xla"))
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
    except Exception:
        pass

from .config.config import Config, ConfigDict  # noqa: F401
from .registry import (BACKBONE, DATASETS, HEADS, NET, PCENCODER,  # noqa: F401
                       build_backbone, build_dataset, build_from_cfg,
                       build_heads, build_net, build_pcencoder)

# Importing model/data modules populates the registries (mirrors the
# reference package-__init__ registration side effects,
# `baseline/models/heads/__init__.py:1-4` etc.).
from .models import (column_head, legacy, lidar_encoder, nets,  # noqa: F401,E402
                     resnet_fpn, resnet_fpn_family, row_head, row_head_base,
                     swin, vit)
from .data import laserlane  # noqa: F401,E402
from .data import las_tiles  # noqa: F401,E402
from .models.nets import build_model  # noqa: F401
from .api import LaneMapper  # noqa: F401

__version__ = "0.1.0"
