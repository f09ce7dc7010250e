"""Parameters and I/O: InputFile, lattices, checkpoint/restart, trajectories.

Mirrors reference basic_concepts/9-reading_parameters.cu,
10-initial_configuration.cu and misc/checkpoint.cu. The checkpoint here
is a full-state pytree *including the RNG key* (the reference's
utils/checkpoint.h:29 saves properties only), so a restart continues the
exact stochastic trajectory.
"""

import os
import tempfile

import numpy as np

from uammd_tpu import make_state
from uammd_tpu.utils import checkpoint
from uammd_tpu.utils.input_file import InputFile
from uammd_tpu.utils.lattices import lattice
from uammd_tpu.utils.trajectory import TrajectoryWriter, read_frames

tmp = tempfile.mkdtemp()

# --- InputFile: the reference's "data.main" key-value format -------------
cfg = os.path.join(tmp, "data.main")
with open(cfg, "w") as f:
    f.write("numberParticles 128\nboxSize 16 16 16\ntemperature 1.5\n")
inp = InputFile(cfg)
n = inp.get("numberParticles", int)
Lx, Ly, Lz = inp.get("boxSize", float, float, float)
print("read:", n, "particles, box", (Lx, Ly, Lz),
      "T =", inp.get("temperature", float))

# --- lattices (InitialConditions.cuh analog) ------------------------------
for kind in ("sc", "fcc", "bcc"):
    p = lattice(n, Lx, kind)
    print(f"{kind}: {p.shape[0]} particles, min coord {float(p.min()):.2f}")

st = make_state(lattice(n, Lx, "fcc"), seed=42)

# --- checkpoint: binary pytree (npz) and reference text format ------------
ck = os.path.join(tmp, "state.npz")
checkpoint.save(ck, st)
st2 = checkpoint.load(ck)
assert np.allclose(np.asarray(st.pos), np.asarray(st2.pos))
print("binary checkpoint roundtrip OK (pos, ids, RNG key)")

ck_txt = os.path.join(tmp, "state.txt")
checkpoint.save_text(ck_txt, st)          # the reference's text layout
st3 = checkpoint.load_text(ck_txt)
assert np.allclose(np.asarray(st.pos), np.asarray(st3.pos), atol=1e-5)
print("reference-format text checkpoint roundtrip OK")

# --- trajectories: xyz-like frames (superIO role) --------------------------
traj = os.path.join(tmp, "traj.xyz")
w = TrajectoryWriter(traj, box=None)
w.write(st.pos)
w.write(st.pos)
frames = read_frames(traj, n)
print("trajectory frames read back:", frames.shape)
assert frames.shape[0] == 2
print("OK")
