# MLP-Mixer correlator ablation (reference
# `configs/Proj_polyline_fpn_mixseg_vertex.py`): flagship pipeline with the
# GFC-T ViT swapped for MixSegNet.
_base_ = ["Proj_polyline_fpn_vit_vertex_2.py"]

backbone = dict(
    _delete_=True,
    type="MixSegNet",
    image_size=144,
    patch_size=8,
    channels=64,
    dim=512,
    depth=3,
    output_channels=8,
    expansion_factor=4,
    dropout=0.0,
)

optimizer = dict(lr=0.0001)
