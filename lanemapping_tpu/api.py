"""High-level one-stop API.

The reference exposes its pipeline only through entry scripts with hardcoded
paths (`/root/reference/train_gpu_0.py:20-24`, `test_gpu_0.py:28-37`); this
module provides the programmatic surface a production user drives:

    import lanemapping_tpu as lm
    mapper = lm.LaneMapper("configs/Proj_polyline_fpn_vit_vertex_2.py",
                           ckpt="logs/run/ckpt/best")
    lanes = mapper.map_tiles(["tile1.png", "tile2.png"])   # decoded polylines
    mapper.map_directory("data/TestArea1", out_dir="out")   # full pipeline
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Union

import numpy as np


class LaneMapper:
    def __init__(self, config: Union[str, "Config"], ckpt: Optional[str] = None,
                 log_dir: Optional[str] = None):
        from .config.config import Config
        from .engine.runner import Runner
        from .engine.checkpoint import load_model

        self.cfg = Config.fromfile(config) if isinstance(config, str) \
            else config
        self.runner = Runner(self.cfg, log_dir=log_dir or "/tmp/lanemapper")
        if ckpt:
            if ckpt.endswith(".pth"):
                from .tools.port_torch_ckpt import port_checkpoint
                self.runner.state, report = port_checkpoint(
                    ckpt, self.runner.state)
            else:
                self.runner.state = load_model(os.path.abspath(ckpt),
                                               self.runner.state)

    # -- tiles -> decoded polylines -----------------------------------------
    def map_arrays(self, tiles: np.ndarray) -> List[Dict]:
        """[B,H,W,3] float tiles -> list of per-tile lane dicts:
        {'lanes': [ {row, col, semantic} vertices ], 'endpoints': [M,2]}"""
        import jax
        from .decode.postprocess import lane_maps_from_decode
        from .tools.export_lanes import lane_records

        # one fused jitted forward+decode dispatch (see Runner._eval_decode)
        dec = jax.device_get(self.runner._eval_decode(
            self.runner.state, jax.device_put(np.asarray(tiles))))
        maps = lane_maps_from_decode(dec, self.cfg)
        results = []
        for b in range(len(tiles)):
            results.append({
                "lanes": lane_records(maps["cls_offset_smooth"][b]),
                "endpoints": np.argwhere(maps["endp_by_cls"][b] > 0),
                "semantic_map": maps["semantic_line"][b],
            })
        return results

    def map_tiles(self, paths: Sequence[str]) -> List[Dict]:
        from PIL import Image

        tiles = []
        for p in paths:
            img = np.array(Image.open(p))
            if img.ndim == 2:
                img = np.stack([img] * 3, -1)
            tiles.append(img[..., :3].astype(np.float32) / 255.0)
        return self.map_arrays(np.stack(tiles))

    # -- full directory pipeline --------------------------------------------
    def map_directory(self, data_root: str, out_dir: str,
                      split: str = "all", params_dir: Optional[str] = None,
                      max_batches: Optional[int] = None) -> str:
        """Dataset dir -> per-tile lane JSONs (+ 3-D global map when a
        transform-params dir is given).  Returns the lane output dir."""
        from .data.loader import build_dataloader

        cfg = self.cfg
        ds_cfg = dict(cfg.dataset.test)
        ds_cfg["data_root"] = data_root
        ds_cfg["mode"] = split
        loader = build_dataloader(ds_cfg, cfg, is_train=False)
        lanes_dir = os.path.join(out_dir, "lanes_2d")
        self.runner.infer_and_export(loader, lanes_dir,
                                     max_batches=max_batches)
        if params_dir and os.path.isdir(params_dir):
            from .tools.img2pc import convert_directory
            from .tools.merge_lines import merge_directory
            pc_dir = convert_directory(
                lanes_dir, os.path.join(data_root, "cropped_tiff"),
                params_dir, n_workers=8)
            merge_directory(pc_dir)
        return lanes_dir

    def evaluate(self, data_root: str, split: str = "test",
                 max_batches: Optional[int] = None) -> Dict:
        from .data.loader import build_dataloader

        ds_cfg = dict(self.cfg.dataset[split if split in self.cfg.dataset
                                       else "test"])
        ds_cfg["data_root"] = data_root
        loader = build_dataloader(ds_cfg, self.cfg, is_train=False)
        return self.runner.validate(loader=loader, max_batches=max_batches)
