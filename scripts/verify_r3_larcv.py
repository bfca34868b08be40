"""Verify drive: meta-less larcv file -> Trainer via CLI config path on TPU."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import h5py, numpy as np, sys
from sparseeventid_tpu.io.larcv import write_synthetic_larcv_file

path = "/tmp/verify_metaless.h5"
write_synthetic_larcv_file(path, n_events=16, image_size=(64, 64, 64), seed=11)
# strip our writer's meta attr -> the reader must fall back to image_size=
with h5py.File(path, "a") as f:
    g = f["Data/sparse3d_dunevoxels_group"]
    if "meta" in g.attrs:
        del g.attrs["meta"]
print("fixture ready (no meta attr)")
