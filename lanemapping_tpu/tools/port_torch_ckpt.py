"""PyTorch checkpoint -> JAX parameter porter.

Maps the reference's released checkpoints (``{net, optim, scheduler, epoch}``
saved by `/root/reference/baseline/utils/net_utils.py:10-21`) onto this
framework's parameter tree so released weights run here for parity checks
(BASELINE.json: sub-pixel polyline match).

Layout rules: torch Conv2d [O,I,kh,kw] -> flax [kh,kw,I,O]; Conv1d(k=1)
[O,I,1] -> Dense [I,O]; Linear [O,I] -> Dense [I,O]; BatchNorm/GroupNorm/
LayerNorm weight/bias -> scale/bias (+ running stats into batch_stats).
The name map below covers Detector1stage = FPNWrapper (postprojector.py:417+)
+ VitSegNet (vitsegnet.py:132+) + ColumnProposal2
(polyline_fpn_vit_vertex_2.py:65+), including the column_att branch
(generate_line_proposal / to_token / per-proposal emb_{i} stacked into one
[P, dim_token] table / tr_lane_correlator / line_expand, `:132-188`); the
always-dead reg_ffn is skipped.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _conv(w):  # torch conv2d -> NHWC HWIO
    return np.transpose(w, (2, 3, 1, 0))


def _dense(w):  # torch linear [O,I] -> [I,O]
    return np.transpose(w, (1, 0))


def _conv1d_dense(w):  # torch conv1d k=1 [O,I,1] -> [I,O]
    return np.transpose(w[:, :, 0], (1, 0))


def load_torch_state_dict(path: str, mmcls: bool = False
                          ) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint into {name: ndarray}.

    Covers the reference `mmcv_custom/checkpoint.py` file-format semantics:
    state_dict extraction from {net|state_dict|model|raw} containers
    (`_load_checkpoint`), DataParallel ``module.`` prefix strip
    (`load_checkpoint:303-306`), and — with ``mmcls=True`` — the mmcls
    ``backbone.`` prefix remap (`_process_mmcls_checkpoint:214-222`).  The
    reference's URL/pavi/s3 fetchers (`:109-170`) are deliberately absent:
    this image has zero egress and they only feed the dead Swin path; local
    files cover every shipped flow.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt if not isinstance(ckpt, dict) else \
        ckpt.get("net", ckpt.get("state_dict", ckpt.get("model", ckpt)))
    out = {}
    for k, v in sd.items():
        k = k.replace("module.", "", 1) if k.startswith("module.") else k
        if mmcls:
            if not k.startswith("backbone."):
                continue
            k = k[len("backbone."):]
        out[k] = v.detach().cpu().numpy()
    return out


def _resnet_block_rules(t_prefix: str, j_prefix: str, n_blocks: int):
    rules = []
    for i in range(n_blocks):
        t = f"{t_prefix}.{i}"
        j = f"{j_prefix}/block{i}"
        rules += [
            (f"{t}.conv1.weight", f"{j}/conv1/kernel", _conv),
            (f"{t}.conv2.weight", f"{j}/conv2/kernel", _conv),
            (f"{t}.bn1", f"{j}/bn1", "bn"),
            (f"{t}.bn2", f"{j}/bn2", "bn"),
            (f"{t}.downsample.0.weight", f"{j}/downsample_conv/kernel", _conv),
            (f"{t}.downsample.1", f"{j}/downsample_bn", "bn"),
        ]
    return rules


def _transformer_rules(t_prefix: str, j_prefix: str, depth: int) -> list:
    """Pre-norm ViT block rules (shared by the correlator backbone,
    `vitsegnet.py:20-83`, and the head's tr_lane_correlator,
    `heads/transformer.py:76-90` — identical structure)."""
    R = []
    for d in range(depth):
        t = f"{t_prefix}.layers.{d}"
        j = f"{j_prefix}/block{d}"
        R += [
            (f"{t}.0.norm.weight", f"{j}/norm1/scale", None),
            (f"{t}.0.norm.bias", f"{j}/norm1/bias", None),
            (f"{t}.0.fn.to_qkv.weight", f"{j}/attn/to_qkv/kernel", _dense),
            (f"{t}.0.fn.to_out.0.weight", f"{j}/attn/to_out/kernel", _dense),
            (f"{t}.0.fn.to_out.0.bias", f"{j}/attn/to_out/bias", None),
            (f"{t}.1.norm.weight", f"{j}/norm2/scale", None),
            (f"{t}.1.norm.bias", f"{j}/norm2/bias", None),
            (f"{t}.1.fn.net.0.weight", f"{j}/mlp/fc1/kernel", _dense),
            (f"{t}.1.fn.net.0.bias", f"{j}/mlp/fc1/bias", None),
            (f"{t}.1.fn.net.3.weight", f"{j}/mlp/fc2/kernel", _dense),
            (f"{t}.1.fn.net.3.bias", f"{j}/mlp/fc2/bias", None),
        ]
    return R


def build_rules(resnet_layers=(3, 4, 6), vit_depth=3, column_att=False,
                tr_depth=1, conv_pool_stages=1) -> list:
    """(torch_key, jax_path, transform) triples for the flagship model."""
    R = []
    # --- FPN encoder -------------------------------------------------------
    enc = "pcencoder"
    fpn = "pcencoder.fpn"
    R += [(f"{fpn}.conv1.weight", f"{enc}/conv1/kernel", _conv),
          (f"{fpn}.bn1", f"{enc}/bn1", "bn"),
          (f"{fpn}.out.weight", f"{enc}/out_conv/kernel", _conv)]
    for li, nb in enumerate(resnet_layers, start=1):
        R += _resnet_block_rules(f"{fpn}.layer{li}", f"{enc}/layer{li}", nb)
    for name in ("toplayer", "smooth1", "smooth2", "smooth3", "latlayer1",
                 "latlayer2", "semantic_branch", "semantic_branch2", "conv2",
                 "conv3", "feature_layer", "output_layer_binary_seg",
                 "output_layer_endp"):
        R += [(f"{fpn}.{name}.weight", f"{enc}/{name}/kernel", _conv),
              (f"{fpn}.{name}.bias", f"{enc}/{name}/bias", None)]
    for gn in ("gn11", "gn12", "gn21", "gn22"):
        R += [(f"{fpn}.{gn}.weight", f"{enc}/{gn}/scale", None),
              (f"{fpn}.{gn}.bias", f"{enc}/{gn}/bias", None)]

    # --- ViT correlator ----------------------------------------------------
    bb = "backbone"
    R += [(f"{bb}.to_patch_embedding.1.weight",
           f"{bb}/patch_embed/kernel", _dense),
          (f"{bb}.to_patch_embedding.1.bias",
           f"{bb}/patch_embed/bias", None),
          (f"{bb}.pos_embedding", f"{bb}/pos_embedding", None)]
    R += _transformer_rules(f"{bb}.transformer", f"{bb}/transformer",
                            vit_depth)

    # --- column-proposal head ---------------------------------------------
    hd = "heads"
    if column_att:
        # reference `:146-188`: Conv_Pool_2d proposal generator, column
        # tokeniser, per-proposal embeddings (stacked by port_state_dict
        # into `{hd}.__emb_stack__`), lane-correlator transformer, expander
        glp = f"{hd}.generate_line_proposal.0.layers"
        jglp = f"{hd}/generate_line_proposal"
        R += [(f"{glp}.0.weight", f"{jglp}/conv0/kernel", _conv),
              (f"{glp}.0.bias", f"{jglp}/conv0/bias", None)]
        for i in range(conv_pool_stages):
            R += [(f"{glp}.{i + 1}.1", f"{jglp}/bn{i}", "bn"),
                  (f"{glp}.{i + 1}.2.weight", f"{jglp}/conv{i + 1}/kernel",
                   _conv),
                  (f"{glp}.{i + 1}.2.bias", f"{jglp}/conv{i + 1}/bias", None)]
        R += [(f"{hd}.to_token.1.weight", f"{hd}/to_token/kernel", _dense),
              (f"{hd}.to_token.1.bias", f"{hd}/to_token/bias", None),
              (f"{hd}.__emb_stack__", f"{hd}/prop_emb", None),
              (f"{hd}.tr_lane_correlator.1.weight",
               f"{hd}/tr_lane_norm/scale", None),
              (f"{hd}.tr_lane_correlator.1.bias",
               f"{hd}/tr_lane_norm/bias", None),
              (f"{hd}.line_expand.0.weight", f"{hd}/line_expand/kernel",
               _dense),
              (f"{hd}.line_expand.0.bias", f"{hd}/line_expand/bias", None)]
        R += _transformer_rules(f"{hd}.tr_lane_correlator.0",
                                f"{hd}/tr_lane_correlator", tr_depth)
    seq = [
        # torch Sequential index -> (jax module, kind)
        ("endpoint.0", "endpoint_conv1", "conv"),
        ("endpoint.2", "endpoint_bn", "bn"),
        ("endpoint.3", "endpoint_conv2", "conv"),
        ("head_common_layers.0", "common_conv1", "conv"),
        ("head_common_layers.1", "common_bn1", "bn"),
        ("head_common_layers.2", "common_conv2", "conv"),
        ("head_common_layers.3", "common_bn2", "bn"),
        ("orient.0", "orient_conv1", "conv"),
        ("orient.1", "orient_bn", "bn"),
        ("orient.2", "orient_conv2", "conv"),
        ("bi_seg_proposal", "bi_seg_proposal", "conv"),
    ]
    for t_name, j_name, kind in seq:
        if kind == "conv":
            R += [(f"{hd}.{t_name}.weight", f"{hd}/{j_name}/kernel", _conv),
                  (f"{hd}.{t_name}.bias", f"{hd}/{j_name}/bias", None)]
        else:
            R += [(f"{hd}.{t_name}", f"{hd}/{j_name}", "bn")]
    R += [(f"{hd}.proposal_confidence.1.weight",
           f"{hd}/proposal_confidence/kernel", _dense),
          (f"{hd}.proposal_confidence.1.bias",
           f"{hd}/proposal_confidence/bias", None)]
    for head in ("ext2", "cls2", "offset2"):
        R += [(f"{hd}.{head}.0.weight", f"{hd}/{head}_fc1/kernel",
               _conv1d_dense),
              (f"{hd}.{head}.0.bias", f"{hd}/{head}_fc1/bias", None),
              (f"{hd}.{head}.1", f"{hd}/{head}_bn", "bn"),
              (f"{hd}.{head}.2.weight", f"{hd}/{head}_fc2/kernel",
               _conv1d_dense),
              (f"{hd}.{head}.2.bias", f"{hd}/{head}_fc2/bias", None)]
    return R


def _set(tree: Dict, path: str, value: np.ndarray, strict_shape=True):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        if p not in node:
            return False
        node = node[p]
    leaf = parts[-1]
    if leaf not in node:
        return False
    old = node[leaf]
    if strict_shape and np.shape(old) != np.shape(value):
        raise ValueError(f"{path}: shape {np.shape(value)} != expected "
                         f"{np.shape(old)}")
    node[leaf] = np.asarray(value, dtype=np.asarray(old).dtype)
    return True


def port_state_dict(sd: Dict[str, np.ndarray], params: Dict,
                    batch_stats: Dict, rules=None) -> Tuple[Dict, Dict, Dict]:
    """Apply the name map; returns (params, batch_stats, report)."""
    import jax

    params = jax.tree.map(np.asarray, params)
    batch_stats = jax.tree.map(np.asarray, batch_stats)
    rules = rules or build_rules()

    def _has(tree, path):
        node = tree
        for p in path.split("/"):
            if not isinstance(node, dict) or p not in node:
                return False
            node = node[p]
        return True

    if _has(params, "pcencoder/conv1_s2d/kernel"):
        # space-to-depth stem (resnet_fpn.s2d_stem): the torch 7x7/s2 stem
        # kernel ports bit-exactly through the s2d regrouping
        def _conv_s2d(w):
            from ..models.resnet_fpn import s2d_stem_kernel
            return s2d_stem_kernel(_conv(w))
        rules = [(t, "pcencoder/conv1_s2d/kernel", _conv_s2d)
                 if (t, j) == ("pcencoder.fpn.conv1.weight",
                               "pcencoder/conv1/kernel") else (t, j, tf)
                 for (t, j, tf) in rules]
    # stack the reference's per-proposal position embeddings emb_{i}
    # (`polyline_fpn_vit_vertex_2.py:163-164`) into one [P, dim_token] table
    import re
    emb = {int(m.group(1)): k for k in sd
           if (m := re.fullmatch(r"heads\.emb_(\d+)", k))}
    if emb:
        sd = dict(sd)
        sd["heads.__emb_stack__"] = np.stack(
            [sd[emb[i]] for i in range(len(emb))], axis=0)
    used = set()
    missing, ported = [], []
    for t_key, j_path, tf in rules:
        if tf == "bn":
            ok = True
            pairs = [(f"{t_key}.weight", f"{j_path}/scale", params),
                     (f"{t_key}.bias", f"{j_path}/bias", params),
                     (f"{t_key}.running_mean", f"{j_path}/mean", batch_stats),
                     (f"{t_key}.running_var", f"{j_path}/var", batch_stats)]
            for tk, jp, tree in pairs:
                if tk in sd:
                    if _set(tree, jp, sd[tk]):
                        used.add(tk)
                    else:
                        ok = False
            if not ok:
                missing.append(j_path)
            else:
                ported.append(j_path)
            continue
        if t_key not in sd:
            continue  # optional branches (no layer4, etc.)
        v = sd[t_key] if tf is None else tf(sd[t_key])
        if _set(params, j_path, v):
            used.add(t_key)
            ported.append(j_path)
        else:
            missing.append(j_path)
    if "heads.__emb_stack__" in used:
        used.update(emb.values())
        used.add("heads.__emb_stack__")
    skipped_torch = [k for k in sd
                     if k not in used and "num_batches_tracked" not in k
                     and k != "heads.__emb_stack__"]
    report = {"ported": ported, "missing_jax": missing,
              "unused_torch": skipped_torch}
    return params, batch_stats, report


def port_checkpoint(torch_ckpt_path: str, state, rules=None):
    """Load a reference ``.pth`` and return a new TrainState with its
    weights (reference load path `runner.py:399-401`)."""
    sd = load_torch_state_dict(torch_ckpt_path)
    params, bs, report = port_state_dict(
        sd, state.params, state.batch_stats, rules)
    return state.replace(params=params, batch_stats=bs), report
