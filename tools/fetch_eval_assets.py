"""Fetch released checkpoints + TAP-Vid eval data to produce real AJ numbers.

The accuracy story of this framework is currently transitive: fp32 graph
parity against the reference implementations at production configuration
(tests/test_tapir_parity_full.py, tests/test_tapnext_torch_parity.py). To
turn that into a measured DAVIS AJ table (reference README.md:163-170), run

  python tools/fetch_eval_assets.py --dest /tmp/tapnet_assets
  python -m tapnet_tpu.tapvid.evaluate \
      --checkpoint /tmp/tapnet_assets/bootstapir_checkpoint_v2.npy \
      --model bootstapir \
      --dataset davis --data_path /tmp/tapnet_assets/tapvid_davis/tapvid_davis.pkl \
      --query_mode first

Asset URLs are the reference's published ones (reference README.md,
colabs/*.ipynb, tapnet/tapvid/README.md). The script verifies each download
and unpacks the DAVIS zip. If the environment has no network egress (the
development environment for this repo does not — every attempt from it
fails at DNS resolution), it exits with a clear report naming the blocker.
"""

from __future__ import annotations

import argparse
import os
import sys
import urllib.error
import urllib.request
import zipfile

BASE = "https://storage.googleapis.com/dm-tapnet"

ASSETS = {
    # Haiku .npy checkpoints (dict {params, state}).
    "tapir_checkpoint_panning.npy": f"{BASE}/tapir_checkpoint_panning.npy",
    "causal_tapir_checkpoint.npy": f"{BASE}/causal_tapir_checkpoint.npy",
    "bootstapir_checkpoint_v2.npy": (
        f"{BASE}/bootstap/bootstapir_checkpoint_v2.npy"
    ),
    "causal_bootstapir_checkpoint.npy": (
        f"{BASE}/bootstap/causal_bootstapir_checkpoint.npy"
    ),
    # Flax flat .npz checkpoints.
    "tapnext_ckpt.npz": f"{BASE}/tapnext/tapnext_ckpt.npz",
    "bootstapnext_ckpt.npz": f"{BASE}/tapnext/bootstapnext_ckpt.npz",
    "track_autoencoder_ckpt.npz": f"{BASE}/trajan/track_autoencoder_ckpt.npz",
    # TAP-Vid benchmark pickles.
    "tapvid_davis.zip": f"{BASE}/tapvid_davis.zip",
    "tapvid_rgb_stacking.zip": f"{BASE}/tapvid_rgb_stacking.zip",
    "robotap.zip": f"{BASE}/robotap/robotap.zip",
}


def fetch(url: str, dest: str) -> bool:
  if os.path.exists(dest) and os.path.getsize(dest) > 0:
    print(f"  exists: {dest}")
    return True
  tmp = dest + ".part"
  try:
    print(f"  GET {url}")
    with urllib.request.urlopen(url, timeout=60) as r, open(tmp, "wb") as f:
      while True:
        chunk = r.read(1 << 20)
        if not chunk:
          break
        f.write(chunk)
    os.replace(tmp, dest)
    print(f"  ok: {dest} ({os.path.getsize(dest) / 1e6:.1f} MB)")
    return True
  except (urllib.error.URLError, OSError, TimeoutError) as e:
    if os.path.exists(tmp):
      os.remove(tmp)
    print(f"  FAILED: {e}")
    return False


def main() -> int:
  parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
  parser.add_argument("--dest", default="/tmp/tapnet_assets")
  parser.add_argument(
      "--only", nargs="*", default=None,
      help="subset of asset names (default: all)",
  )
  args = parser.parse_args()
  os.makedirs(args.dest, exist_ok=True)

  names = args.only or list(ASSETS)
  ok, failed = [], []
  for name in names:
    if name not in ASSETS:
      print(f"unknown asset {name!r}; choices: {sorted(ASSETS)}")
      return 2
    path = os.path.join(args.dest, name)
    (ok if fetch(ASSETS[name], path) else failed).append(name)
    if name.endswith(".zip") and os.path.exists(path):
      out = os.path.join(args.dest, name[:-4])
      if not os.path.isdir(out):
        print(f"  unzip -> {out}")
        with zipfile.ZipFile(path) as z:
          z.extractall(out)

  print(f"\nfetched {len(ok)}/{len(names)}")
  if failed:
    print(
        "Missing assets: " + ", ".join(failed) + "\n"
        "If every download failed with a DNS/connection error, this "
        "environment has no network egress; run this script from a "
        "machine with internet access and copy --dest over."
    )
    return 1
  return 0


if __name__ == "__main__":
  sys.exit(main())
