#!/usr/bin/env python
"""Fetch (or validate) Event Camera Dataset sequences for evaluation.

The reference's headline quality numbers (report.pdf p.10, Tables 1-2) are
measured on the uzh-rpg Event Camera Dataset (ECD) sequences `shapes_6dof`
and `poster_6dof`, ingested through the DAVIS240C text format its reader
parses (`tools/dataset_reader/src/davis240c_reader.cpp`). This tool makes
the TPU framework ECD-ready end to end:

- `fetch`: download a sequence zip from rpg.ifi.uzh.ch and extract it into a
  `Davis240cDataset`-ingestible directory (events.txt / images.txt /
  images/ / groundtruth.txt / calib.txt — the ECD "Text (zip)" distribution
  is byte-compatible with the reference's format, proven on its verbatim
  fixtures in tests/test_io.py). Offline environments skip gracefully: the
  failure is reported with the manual URL and the exit code stays 0 unless
  `--strict`.
- `convert`: normalize an already-downloaded/extracted directory in place
  (strip CRLF, drop imu.txt-style extras from images.txt, synthesize a
  calib.txt from known ECD intrinsics when missing).
- `check`: validate that a directory parses through the framework's reader
  (first lines of each stream + calib), without loading the full sequence.

Once fetched, the evaluation producing the uzh-rpg tracker-eval
`trajectory.txt` artifact (consumed by the external evaluator the reference
cites at `evaluator.cpp:127-128`) is:

    python tools/fetch_ecd.py fetch shapes_6dof --dest data/
    python -m evo_tpu.run.cli --dataset data/shapes_6dof \
        --output-dir out/shapes_6dof --tracker-experiment
    # -> out/shapes_6dof/trajectory.txt   (lines: "id t x y")

Dry-run everything offline with:  python tools/fetch_ecd.py fetch shapes_6dof --dry-run
"""

from __future__ import annotations

import argparse
import os
import sys
import zipfile

BASE_URL = "https://rpg.ifi.uzh.ch/datasets/davis"

# The ECD DAVIS240C catalog relevant to the reference's evaluation
# (report §4: shapes_6dof / poster_6dof; the rest share the same format).
SEQUENCES = {
    "shapes_6dof": {"zip": f"{BASE_URL}/shapes_6dof.zip", "approx_mb": 220},
    "shapes_translation": {"zip": f"{BASE_URL}/shapes_translation.zip", "approx_mb": 140},
    "shapes_rotation": {"zip": f"{BASE_URL}/shapes_rotation.zip", "approx_mb": 150},
    "poster_6dof": {"zip": f"{BASE_URL}/poster_6dof.zip", "approx_mb": 450},
    "poster_translation": {"zip": f"{BASE_URL}/poster_translation.zip", "approx_mb": 380},
    "boxes_6dof": {"zip": f"{BASE_URL}/boxes_6dof.zip", "approx_mb": 480},
    "dynamic_6dof": {"zip": f"{BASE_URL}/dynamic_6dof.zip", "approx_mb": 280},
}

# Published DAVIS240C intrinsics of the ECD rig (calibration file shipped
# with every sequence; reproduced so `convert` can synthesize calib.txt for
# partial downloads). Order matches the reference's calib parser
# (davis240c_reader.cpp:18-58): fx fy cx cy k1 k2 p1 p2 k3.
ECD_DAVIS_CALIB = (
    199.092366542, 198.82882047, 132.192071378, 110.712660011,
    -0.368436311798, 0.150947243557, -0.000296130534385, -0.000759431726241,
    0.0,
)

REQUIRED = ("events.txt", "images.txt", "calib.txt")
OPTIONAL = ("groundtruth.txt", "imu.txt")


def _eprint(*a):
    print(*a, file=sys.stderr)


def _extract_zip(zpath: str, out_dir: str) -> None:
    print(f"extracting {zpath} -> {out_dir}")
    with zipfile.ZipFile(zpath) as z:
        z.extractall(out_dir)
    # some ECD zips nest a single top-level directory; flatten it
    entries = os.listdir(out_dir)
    if len(entries) == 1 and os.path.isdir(os.path.join(out_dir, entries[0])):
        inner = os.path.join(out_dir, entries[0])
        for name in os.listdir(inner):
            os.rename(os.path.join(inner, name), os.path.join(out_dir, name))
        os.rmdir(inner)


def fetch(seq: str, dest: str, dry_run: bool = False, strict: bool = False,
          timeout_s: float = 20.0, from_file: str | None = None) -> int:
    """Materialize an ECD sequence under `dest/seq`.

    `from_file` ingests a LOCAL archive instead of the network: a `.zip` of
    the ECD "Text (zip)" distribution, or an already-extracted directory.
    This is the zero-egress path — download the zip on any network-enabled
    host, carry it over, and:

        python tools/fetch_ecd.py fetch shapes_6dof --from-file shapes_6dof.zip --dest data/
        python -m evo_tpu.run.cli --dataset data/shapes_6dof \\
            --output-dir out/shapes_6dof --tracker-experiment
        python -m evo_tpu.run.quality  # real-data QUALITY rows
    """
    if seq not in SEQUENCES:
        _eprint(f"unknown sequence {seq!r}; known: {', '.join(SEQUENCES)}")
        return 2
    url = SEQUENCES[seq]["zip"]
    out_dir = os.path.join(dest, seq)
    if os.path.exists(os.path.join(out_dir, "events.txt")):
        print(f"{out_dir} already present")
        return check(out_dir, quick=True)
    if from_file is not None:
        if not os.path.exists(from_file):
            _eprint(f"--from-file {from_file}: no such file or directory")
            return 2
        os.makedirs(dest, exist_ok=True)
        if os.path.isdir(from_file):
            import shutil

            print(f"copying {from_file} -> {out_dir}")
            shutil.copytree(from_file, out_dir, dirs_exist_ok=True)
            entries = os.listdir(out_dir)
            if len(entries) == 1 and os.path.isdir(os.path.join(out_dir, entries[0])):
                inner = os.path.join(out_dir, entries[0])
                for name in os.listdir(inner):
                    os.rename(os.path.join(inner, name), os.path.join(out_dir, name))
                os.rmdir(inner)
        else:
            _extract_zip(from_file, out_dir)
        convert(out_dir)
        return check(out_dir, quick=True)
    if dry_run:
        print(f"dry-run: would download {url} "
              f"(~{SEQUENCES[seq]['approx_mb']} MB) -> {out_dir}")
        print("dry-run: offline-safe, nothing fetched")
        return 0
    os.makedirs(dest, exist_ok=True)
    zpath = os.path.join(dest, f"{seq}.zip")
    try:
        import urllib.request

        print(f"downloading {url} ...")
        with urllib.request.urlopen(url, timeout=timeout_s) as r, \
                open(zpath, "wb") as f:
            while True:
                buf = r.read(1 << 20)
                if not buf:
                    break
                f.write(buf)
    except Exception as e:  # zero-egress / offline environments
        _eprint(f"download failed ({e.__class__.__name__}: {e}).")
        _eprint(f"Offline? Fetch manually from {url} and ingest locally:")
        _eprint(f"  python tools/fetch_ecd.py fetch {seq} "
                f"--from-file {seq}.zip --dest {dest}")
        return 1 if strict else 0
    _extract_zip(zpath, out_dir)
    os.remove(zpath)
    convert(out_dir)
    return check(out_dir, quick=True)


def convert(path: str) -> int:
    """Normalize an extracted ECD directory in place (idempotent)."""
    # CRLF -> LF on the text streams (some mirrors re-zip on Windows)
    for name in REQUIRED + OPTIONAL:
        p = os.path.join(path, name)
        if not os.path.exists(p) or name == "calib.txt":
            continue
        with open(p, "rb") as f:
            head = f.read(1 << 16)
        if b"\r" in head:
            print(f"normalizing CRLF in {name}")
            with open(p, "rb") as f:
                data = f.read()
            with open(p, "wb") as f:
                f.write(data.replace(b"\r\n", b"\n").replace(b"\r", b"\n"))
    calib = os.path.join(path, "calib.txt")
    if not os.path.exists(calib):
        print("calib.txt missing; writing published ECD DAVIS240C intrinsics")
        with open(calib, "w") as f:
            f.write(" ".join(f"{v:.12g}" for v in ECD_DAVIS_CALIB) + "\n")
    return 0


def check(path: str, quick: bool = False) -> int:
    """Validate that `path` parses through the framework's DAVIS reader."""
    missing = [n for n in REQUIRED if not os.path.exists(os.path.join(path, n))]
    if missing:
        _eprint(f"{path}: missing {', '.join(missing)}")
        return 1
    # parse heads without loading the full (multi-GB) event stream
    import numpy as np

    ev_head = np.loadtxt(os.path.join(path, "events.txt"), max_rows=5)
    if ev_head.ndim != 2 or ev_head.shape[1] != 4:
        _eprint(f"{path}/events.txt: expected 4 columns 't x y p'")
        return 1
    if not set(np.unique(ev_head[:, 3])) <= {0.0, 1.0}:
        _eprint(f"{path}/events.txt: polarity column must be 0/1")
        return 1
    with open(os.path.join(path, "images.txt")) as f:
        first = f.readline().split()
    if len(first) != 2:
        _eprint(f"{path}/images.txt: expected 't path' lines")
        return 1
    img = os.path.join(path, first[1])
    if not os.path.exists(img):
        _eprint(f"{path}: first referenced image {first[1]} not found")
        return 1
    calib = np.loadtxt(os.path.join(path, "calib.txt"))
    if calib.size != 9:
        _eprint(f"{path}/calib.txt: expected 9 scalars")
        return 1
    gt = os.path.join(path, "groundtruth.txt")
    n_gt = 0
    if os.path.exists(gt):
        g = np.loadtxt(gt, max_rows=5)
        if g.ndim != 2 or g.shape[1] != 8:
            _eprint(f"{path}/groundtruth.txt: expected 't tx ty tz qx qy qz qw'")
            return 1
        n_gt = len(g)
    if not quick:
        # full-reader smoke test (native mmap parser): bounded by file size
        # so checking a multi-GB sequence stays cheap — parse a head slice
        # through the same code path Davis240cDataset uses
        import tempfile

        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        from evo_tpu.io import davis

        src = os.path.join(path, "events.txt")
        if os.path.getsize(src) > 64 << 20:
            with open(src, "rb") as f:
                head = f.read(1 << 20)
            head = head[: head.rfind(b"\n") + 1]
            with tempfile.NamedTemporaryFile(suffix=".txt", delete=False) as tf:
                tf.write(head)
                src = tf.name
        ev = davis.parse_events(src)
        print(f"reader ok: parsed {len(ev)} events through the native path")
    print(f"{path}: valid DAVIS240C/ECD layout "
          f"(gt head rows: {n_gt if n_gt else 'absent'})")
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    sub = ap.add_subparsers(dest="cmd", required=True)
    f = sub.add_parser("fetch", help="download + extract an ECD sequence")
    f.add_argument("sequence", choices=sorted(SEQUENCES))
    f.add_argument("--dest", default="data")
    f.add_argument("--dry-run", action="store_true",
                   help="print the plan without touching the network")
    f.add_argument("--from-file", default=None, metavar="ZIP_OR_DIR",
                   help="ingest a locally provided ECD archive (zip) or "
                        "extracted directory instead of downloading — the "
                        "zero-egress path to real-data QUALITY rows")
    f.add_argument("--strict", action="store_true",
                   help="exit nonzero when the download fails (default: "
                        "offline environments skip gracefully)")
    c = sub.add_parser("convert", help="normalize an extracted directory")
    c.add_argument("path")
    k = sub.add_parser("check", help="validate a dataset directory")
    k.add_argument("path")
    k.add_argument("--quick", action="store_true",
                   help="layout/head checks only (no reader import)")
    args = ap.parse_args(argv)
    if args.cmd == "fetch":
        return fetch(args.sequence, args.dest, args.dry_run, args.strict,
                     from_file=args.from_file)
    if args.cmd == "convert":
        return convert(args.path)
    return check(args.path, quick=args.quick)


if __name__ == "__main__":
    sys.exit(main())
