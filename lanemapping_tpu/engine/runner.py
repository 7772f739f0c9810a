"""Training / validation / inference driver.

Parity with `/root/reference/baseline/engine/runner.py:67-868`: seeds, model
build, optimizer+cosine schedule, per-iteration scheduler step, NaN-guarded
updates, periodic eval with a composite best-model metric
(0.9*coor_F1 + 0.1*endp_F1, `runner.py:344`), txt/JSONL logging and
checkpointing.  TPU-native replacements: the DataParallel/DDP/NCCL stack is
one data-axis mesh (`parallel/mesh.py`), device transfer is an async sharded
device_put, and the whole step (fwd+bwd+opt) is a single jitted function.
"""

from __future__ import annotations

import json
import os
import random
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import build_dataloader
from ..models.head_losses import (column_proposal_loss, head_hparams,
                                  segmentor_loss)
from ..models.nets import build_model
from ..parallel.mesh import make_mesh, replicated, shard_batch
from .checkpoint import load_model, load_network_filtered, save_model
from .optimizer import build_optimizer
from .state import TrainState, create_train_state, make_eval_step, \
    make_train_step

TRAIN_BATCH_KEYS = ("proj", "prop_ext", "prop_coor", "prop_offset",
                    "prop_offset_mask", "prop_bi_seg", "lc_orient",
                    "semantic_label_raw", "endp_map", "mask", "label",
                    "points", "points_mask")


class Runner:
    def __init__(self, cfg, log_dir: Optional[str] = None):
        self.cfg = cfg
        seed = cfg.get("seed", 0)
        random.seed(seed)
        np.random.seed(seed)
        self.rng = jax.random.PRNGKey(seed)

        self.log_dir = log_dir or cfg.get("log_dir", "./logs")
        os.makedirs(self.log_dir, exist_ok=True)

        self.model = build_model(cfg)
        self.tx = build_optimizer(cfg)
        self.mesh = make_mesh(cfg)

        img = cfg.list_img_size_xy[0]
        example = jnp.zeros((1, img, img, 3), jnp.float32)
        self.rng, init_rng = jax.random.split(self.rng)
        state = create_train_state(self.model, self.tx, init_rng, example)
        # replicate across the mesh; batches are sharded on the data axis
        self.state = jax.device_put(state, replicated(self.mesh))

        head_type = cfg.heads.type if "heads" in cfg else None
        if cfg.net.type == "Segmentor":
            self._loss_fn = segmentor_loss
        elif head_type == "RowSharNotReducRef":
            from ..models.row_head import row_shar_loss
            n_lanes, row_size = cfg.number_lanes, cfg.heads.row_size
            lam = cfg.heads.get("lambda_cls", 1.0)
            self._loss_fn = lambda out, batch: row_shar_loss(
                out, batch, n_lanes=n_lanes, row_size=row_size,
                lambda_cls=lam)
        elif head_type == "GridSeg":
            from ..models.row_head import grid_seg_loss
            n_classes = cfg.heads.num_classes
            ds_type = cfg.get("dataset_type", "LaserLane")
            self._loss_fn = lambda out, batch: grid_seg_loss(
                out, batch, num_classes=n_classes, dataset_type=ds_type)
        else:
            hp = head_hparams(cfg)
            self._loss_fn = lambda out, batch: column_proposal_loss(
                out, batch, hp)

        self._train_step = jax.jit(
            make_train_step(self.model, self.tx, self._loss_fn),
            donate_argnums=(0,))
        self._eval_step = jax.jit(make_eval_step(self.model))
        self.best_metric = -1.0

        if cfg.get("load_from"):
            self.state = load_model(cfg.load_from, self.state)
        elif cfg.get("finetune_from"):
            self.state = load_network_filtered(cfg.finetune_from, self.state)

    # -- logging -----------------------------------------------------------
    def _log(self, tag: str, record: Dict):
        record = {k: (float(v) if isinstance(v, (jnp.ndarray, np.ndarray))
                      else v) for k, v in record.items()}
        with open(os.path.join(self.log_dir, f"{tag}.jsonl"), "a") as f:
            f.write(json.dumps(record) + "\n")

    # -- loops --------------------------------------------------------------
    def _device_batch(self, batch: Dict) -> Dict:
        db = {k: v for k, v in batch.items() if k in TRAIN_BATCH_KEYS
              and not isinstance(v, list)}
        return shard_batch(db, self.mesh)

    def train_epoch(self, loader, epoch: int) -> Dict:
        t0 = time.time()
        last = {}
        for it, batch in enumerate(loader):
            self.rng, step_rng = jax.random.split(self.rng)
            db = self._device_batch(batch)
            self.state, stats = self._train_step(self.state, db, step_rng)
            if it % 10 == 0:
                stats = jax.device_get(stats)
                rec = {"epoch": epoch, "iter": it,
                       **{k: float(v) for k, v in stats.items()}}
                self._log("train", rec)
                last = rec
        last["epoch_time_s"] = time.time() - t0
        return last

    def train(self, max_iters: Optional[int] = None):
        cfg = self.cfg
        loader = build_dataloader(cfg.dataset.train, cfg, is_train=True)
        it_count = 0
        for epoch in range(cfg.epochs):
            for batch in loader:
                self.rng, step_rng = jax.random.split(self.rng)
                db = self._device_batch(batch)
                self.state, stats = self._train_step(self.state, db, step_rng)
                if it_count % 10 == 0:
                    s = {k: float(v) for k, v in
                         jax.device_get(stats).items()}
                    self._log("train", {"epoch": epoch, "iter": it_count, **s})
                it_count += 1
                if max_iters is not None and it_count >= max_iters:
                    return
            if (epoch + 1) % cfg.get("eval_ep", 1) == 0:
                self.validate(epoch)
            if (epoch + 1) % cfg.get("save_ep", 5) == 0:
                save_model(self.log_dir, self.state, f"epoch_{epoch + 1}")

    def validate(self, epoch: int = 0, max_batches: Optional[int] = None,
                 loader=None) -> Dict:
        cfg = self.cfg
        if loader is None:
            split = cfg.dataset.get("val") or cfg.dataset.test
            loader = build_dataloader(split, cfg, is_train=False)
        if cfg.net.type == "Segmentor":
            metrics = self._validate_seg(loader, max_batches)
        else:
            metrics = self._validate_lanes(loader, max_batches)
        metric = metrics.get("composite", metrics.get("val_loss_neg", 0.0))
        self._log("val", {"epoch": epoch, **metrics})
        if metric > self.best_metric:
            self.best_metric = metric
            save_model(self.log_dir, self.state, "best")
        return metrics

    def _validate_seg(self, loader, max_batches) -> Dict:
        from ..utils.metrics import (eval_metric_endp_detector,
                                     eval_metric_line_segmentor)
        seg_scores, endp_scores = [], []
        for i, batch in enumerate(loader):
            if max_batches is not None and i >= max_batches:
                break
            out = self._eval_step(self.state,
                                  jax.device_put(batch["proj"]))
            from ..decode.seg_infer import segmentor_infer
            pred = segmentor_infer(out, seg_thre=self.cfg.get("seg_thre", 0.1),
                                   n_lanes=self.cfg.number_lanes)
            pred = jax.device_get(pred)
            for b in range(batch["proj"].shape[0]):
                seg_scores.append(eval_metric_line_segmentor(
                    pred["seg"][b], batch["mask"][b], buffer_px=10))
                endp_scores.append(eval_metric_endp_detector(
                    np.argwhere(pred["endp"][b] > 0),
                    batch["endp_map"][b], r_thre=20))
        seg_f1 = float(np.mean([s["f1"] for s in seg_scores])) if seg_scores \
            else 0.0
        endp_f1 = float(np.mean([s["f1"] for s in endp_scores])) \
            if endp_scores else 0.0
        return {"seg_f1": seg_f1, "endp_f1": endp_f1,
                "composite": 0.9 * seg_f1 + 0.1 * endp_f1}

    def _validate_lanes(self, loader, max_batches) -> Dict:
        """Lane-coordinate validation (reference `runner.py:223-353`)."""
        from ..decode.lane_decode import decode_lanes
        from ..decode.postprocess import lane_maps_from_decode
        from ..utils.metrics import cal_coor_measures, \
            eval_metric_endp_detector
        cfg = self.cfg
        coor_f1s, endp_f1s = [], []
        for i, batch in enumerate(loader):
            if max_batches is not None and i >= max_batches:
                break
            out = self._eval_step(self.state, jax.device_put(batch["proj"]))
            dec = jax.device_get(decode_lanes(out, cfg))
            maps = lane_maps_from_decode(dec, cfg)
            for b in range(batch["proj"].shape[0]):
                label = batch["lc_coor_raw"][b]
                pred = maps["cls_offset_smooth"][b][:, :, 0]
                m = cal_coor_measures(label, pred,
                                      buffer_px=cfg.get("validate_buffer", 10),
                                      img_size=cfg.list_img_size_xy[0])
                coor_f1s.append(m["f1"])
                endp_f1s.append(eval_metric_endp_detector(
                    np.argwhere(maps["endp_by_cls"][b] > 0),
                    batch["endp_map"][b], r_thre=2 * cfg.get(
                        "validate_buffer", 10))["f1"])
        coor = float(np.mean(coor_f1s)) if coor_f1s else 0.0
        endp = float(np.mean(endp_f1s)) if endp_f1s else 0.0
        return {"coor_f1": coor, "endp_f1": endp,
                "composite": 0.9 * coor + 0.1 * endp}


def load_config_and_runner(path_config: str, log_dir: Optional[str] = None):
    """Reference `runner.py:57-66` equivalent."""
    from ..config.config import Config
    cfg = Config.fromfile(path_config)
    return cfg, Runner(cfg, log_dir=log_dir)
