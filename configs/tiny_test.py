# CPU-runnable miniature of the flagship config: 192px tiles (S=24), 12
# proposals — same architecture wiring, shrunk for tests/dry-runs.
_base_ = ["Proj_polyline_fpn_vit_vertex_2.py"]

list_img_size_xy = [192, 192]

backbone = dict(image_size=24, dim=128, depth=1, heads=4, dim_head=32)

heads = dict(row_size=24, num_prop=12, dim_shared=32)

batch_size = 2
epochs = 1
total_iter = 4
scheduler = dict(T_max=4)
workers = 0
compute_dtype = "float32"
# the flagship base now ships train_compute_dtype=bfloat16 (TPU default by
# measurement); tests/dry-runs on CPU stay f32 for exact-parity assertions
train_compute_dtype = "float32"
mesh_shape = dict(data=2)
