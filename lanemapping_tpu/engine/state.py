"""Train state pytree + step functions."""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray  # int32 scalar


def create_train_state(model, tx: optax.GradientTransformation, rng,
                       example_proj) -> TrainState:
    variables = model.init(rng, example_proj, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(params=params, batch_stats=batch_stats,
                      opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))


def is_mono_batch(a) -> bool:
    """Whether an image batch is channel-replicated mono ([B,H,W,3] with all
    three channels identical).  BEV intensity tiles are one LiDAR return
    intensity replicated into 3 PNG channels (reference
    `laserlane_proposals.py:85-98` loads them unchanged); such a batch can
    ship as ONE channel and be broadcast back on device (`model_input`) —
    3x less H2D, bit-identical activations.  Single content-check shared by
    `Runner._mono_squeeze` and the streaming CLI so the squeeze contract
    cannot silently diverge."""
    import numpy as np
    return bool(a.ndim == 4 and a.shape[-1] == 3
                and np.array_equal(a[..., 0], a[..., 1])
                and np.array_equal(a[..., 1], a[..., 2]))


def model_input(batch: Dict, use_lidar: bool = False, compute_dtype=None):
    """The net's forward input from a batch dict: the BEV image tensor, or —
    on the raw-LiDAR path (reference `runner.py:139-147` to_cuda
    list-of-points branch) — the padded static points buffer + mask that
    `LidarEncoder` consumes.

    A uint8 ``proj`` (shipped raw to halve H2D traffic; the PNG sources are
    uint8 so /255 on device is bit-identical to the host float path) is
    normalised here and dropped to ``compute_dtype`` so bf16 training
    actually runs bf16 (f32 input + bf16 params would promote every layer
    back to f32)."""
    if use_lidar:
        return {"points": batch["points"], "points_mask": batch["points_mask"]}
    proj = batch["proj"]
    if proj.dtype == jnp.uint8:
        proj = proj.astype(jnp.float32) / 255.0
        if compute_dtype is not None:
            proj = proj.astype(compute_dtype)
    if proj.shape[-1] == 1:
        # mono tile shipped as one channel (see Runner._device_batch):
        # broadcast back to the 3-channel input the encoder expects
        proj = jnp.broadcast_to(proj, proj.shape[:-1] + (3,))
    return proj


def make_train_step(model, tx, loss_fn: Callable[[Dict, Dict], Dict],
                    compute_dtype=None, use_lidar: bool = False):
    """Build the jittable training step.

    ``loss_fn(out, batch) -> {'loss', 'loss_stats'}``.  Includes the
    reference's NaN guard (`runner.py:178`): a non-finite loss skips the
    parameter update instead of poisoning the weights.

    ``compute_dtype=jnp.bfloat16`` enables mixed precision: f32 master
    params/optimizer state, bf16 forward/backward (params cast inside the
    differentiated function so gradients come back f32), f32 losses.
    """

    def step(state: TrainState, batch: Dict, rng) -> Tuple[TrainState, Dict]:
        def inner(params):
            if compute_dtype is not None:
                params = jax.tree.map(
                    lambda x: x.astype(compute_dtype)
                    if x.dtype == jnp.float32 else x, params)
            variables = {"params": params, "batch_stats": state.batch_stats}
            out, updates = model.apply(
                variables, model_input(batch, use_lidar, compute_dtype),
                train=True,
                mutable=["batch_stats"], rngs={"dropout": rng})
            res = loss_fn(out, batch)
            return res["loss"], (res["loss_stats"],
                                 updates.get("batch_stats", {}))

        (loss, (stats, new_bs)), grads = jax.value_and_grad(
            inner, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        ok = jnp.isfinite(loss)
        sel = lambda new, old: jax.tree.map(
            lambda n, o: jnp.where(ok, n, o), new, old)
        new_state = TrainState(
            params=sel(new_params, state.params),
            batch_stats=sel(new_bs, state.batch_stats) if new_bs else
            state.batch_stats,
            opt_state=sel(new_opt, state.opt_state),
            step=state.step + 1,
        )
        stats = dict(stats)
        stats["loss"] = loss
        stats["skipped_nan"] = (~ok).astype(jnp.float32)
        return new_state, stats

    return step


def make_eval_step(model):
    def step(state: TrainState, proj):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        return model.apply(variables, proj, train=False)

    return step
