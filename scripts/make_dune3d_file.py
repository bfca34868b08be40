#!/usr/bin/env python
"""Generate a dune3d-occupancy synthetic larcv file for end-to-end
throughput measurement (VERDICT r2 item #3: loader-vs-device occupancy).

~25k active voxels/event on the full 1024x512x1280 grid, 512 events.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from sparseeventid_tpu.io.larcv import write_synthetic_larcv_file

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dune3d_synth.h5"
n = int(sys.argv[2]) if len(sys.argv) > 2 else 512
t0 = time.time()
write_synthetic_larcv_file(
    out, n_events=n, image_size=(1024, 512, 1280), seed=1234,
    mean_tracks=40.0, steps_per_track=900, max_voxels=50000,
)
print(f"wrote {n} events to {out} in {time.time()-t0:.1f}s, "
      f"{os.path.getsize(out)/1e6:.1f} MB")
