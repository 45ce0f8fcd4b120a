"""Export a compact params-only artifact from a training checkpoint.

Strips the optimizer state and stores parameters as float16 (halving the
file again), so a trained model can be committed / shipped without the
~3x-larger full training checkpoint. The result loads through
`checkpoints.tapir_checkpoint.load_tapir_checkpoint` (native-format
branch) like any other checkpoint.

  python tools/export_trained_params.py runs/bootstapir_synth/checkpoint.npy \
      runs/bootstapir_synth/trained_params_f16.npy
"""

import sys

import numpy as np


def main():
  src, dst = sys.argv[1], sys.argv[2]
  ckpt = np.load(src, allow_pickle=True).item()

  def to_f16(tree):
    if isinstance(tree, dict):
      return {k: to_f16(v) for k, v in tree.items()}
    arr = np.asarray(tree)
    return arr.astype(np.float16) if arr.dtype == np.float32 else arr

  out = {"params": to_f16(ckpt["params"]), "step": int(ckpt.get("step", 0))}
  tmp = dst + "_tmp"
  with open(tmp, "wb") as f:
    np.save(f, out, allow_pickle=True)
  import os

  os.replace(tmp, dst)
  print(f"wrote {dst} (step {out['step']}, "
        f"{os.path.getsize(dst) / 2**20:.1f} MiB)")


if __name__ == "__main__":
  main()
