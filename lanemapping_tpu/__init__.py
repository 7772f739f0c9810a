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

from .config.config import Config, ConfigDict  # noqa: F401
from .registry import (BACKBONE, DATASETS, HEADS, NET, PCENCODER,  # noqa: F401
                       build_backbone, build_dataset, build_from_cfg,
                       build_heads, build_net, build_pcencoder)

# Importing model/data modules populates the registries (mirrors the
# reference package-__init__ registration side effects,
# `baseline/models/heads/__init__.py:1-4` etc.).
from .models import (column_head, legacy, lidar_encoder, nets,  # noqa: F401,E402
                     resnet_fpn, resnet_fpn_family, row_head, swin, vit)
from .data import laserlane  # noqa: F401,E402
from .data import las_tiles  # noqa: F401,E402
from .models.nets import build_model  # noqa: F401
from .api import LaneMapper  # noqa: F401

__version__ = "0.1.0"
