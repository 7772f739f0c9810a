"""High-level LaneMapper API + .pth porter roundtrip + mixed precision."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    from lanemapping_tpu.data.synthetic import generate_dataset
    root = tmp_path_factory.mktemp("api_synth")
    generate_dataset(str(root), n_tiles=4, img=192, seed=51)
    return str(root)


@pytest.mark.slow
def test_lanemapper_map_and_evaluate(tiny_cfg, synth_root, tmp_path):
    from lanemapping_tpu.api import LaneMapper

    cfg = tiny_cfg
    for s in ("train", "val", "test"):
        cfg.dataset[s]["data_root"] = synth_root
    mapper = LaneMapper(cfg, log_dir=str(tmp_path / "lm"))
    tiles = [os.path.join(synth_root, "cropped_tiff", f)
             for f in sorted(os.listdir(
                 os.path.join(synth_root, "cropped_tiff")))[:2]]
    results = mapper.map_tiles(tiles)
    assert len(results) == 2
    assert "lanes" in results[0] and "endpoints" in results[0]
    assert results[0]["semantic_map"].shape == (192, 192)

    out_dir = mapper.map_directory(synth_root, str(tmp_path / "out"),
                                   split="all", max_batches=1)
    assert any(f.endswith(".json") for f in os.listdir(out_dir))

    m = mapper.evaluate(synth_root, split="test", max_batches=1)
    assert "composite" in m


def test_pth_checkpoint_roundtrip(tiny_cfg, tmp_path):
    """Serialize a torch-style checkpoint to disk and load it through the
    public .pth path (reference ckpt format, `net_utils.py:10-21`)."""
    import torch
    import jax
    from lanemapping_tpu.models.nets import build_model
    from lanemapping_tpu.tools.port_torch_ckpt import (build_rules,
                                                       port_checkpoint)
    from lanemapping_tpu.engine.state import TrainState

    cfg = tiny_cfg
    model = build_model(cfg)
    import jax.numpy as jnp
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 192, 192, 3)),
                   train=False)
    state = TrainState(params=jax.device_get(v["params"]),
                       batch_stats=jax.device_get(v["batch_stats"]),
                       opt_state=None, step=np.int32(0))

    # fabricate a .pth with one recognizable tensor
    w = torch.randn(64, 3, 7, 7)
    ckpt = {"net": {"module.pcencoder.fpn.conv1.weight": w}, "epoch": 3}
    p = str(tmp_path / "best.pth")
    torch.save(ckpt, p)
    new_state, report = port_checkpoint(p, state)
    np.testing.assert_allclose(
        new_state.params["pcencoder"]["conv1"]["kernel"],
        w.numpy().transpose(2, 3, 1, 0))
    assert "pcencoder/conv1/kernel" in report["ported"]


@pytest.mark.slow
def test_mixed_precision_train_step(tiny_cfg, synth_root, tmp_path):
    import jax
    from lanemapping_tpu.engine.runner import Runner
    from lanemapping_tpu.data.loader import build_dataloader

    cfg = tiny_cfg
    cfg.train_compute_dtype = "bfloat16"
    for s in ("train", "val", "test"):
        cfg.dataset[s]["data_root"] = synth_root
    cfg.log_dir = str(tmp_path / "logs")
    runner = Runner(cfg, log_dir=cfg.log_dir)
    loader = build_dataloader(cfg.dataset.train, cfg, is_train=True)
    batch = next(iter(loader))
    runner.rng, rng = jax.random.split(runner.rng)
    runner.state, stats = runner._train_step(
        runner.state, runner._device_batch(batch), rng)
    assert np.isfinite(float(stats["loss"]))
    # master params stay f32
    leaf = jax.tree.leaves(runner.state.params)[0]
    assert leaf.dtype == np.float32


def test_package_import_does_not_initialise_backend():
    """Multi-host entrypoints import the package BEFORE
    jax.distributed.initialize; any module-level device-array creation
    (e.g. a jnp constant) initialises the XLA backend at import time and
    breaks initialize() with 'must be called before any JAX calls'.
    Regression guard: import in a clean subprocess and assert no backend."""
    import subprocess
    import sys
    code = (
        "import lanemapping_tpu\n"
        "from jax._src import xla_bridge\n"
        "assert not dict(getattr(xla_bridge, '_backends', {})), "
        "'package import initialised an XLA backend'\n"
        "print('clean')\n")
    p = subprocess.run([sys.executable, "-c", code],
                       env={**__import__('os').environ,
                            "JAX_PLATFORMS": "cpu"},
                       capture_output=True, text=True, timeout=600)
    assert p.returncode == 0 and "clean" in p.stdout, p.stderr[-1500:]
