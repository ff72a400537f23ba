#!/usr/bin/env python
"""Convert a URDF into the framework's native JSON model description.

Usage: python tools/import_urdf.py robot.urdf out.json [--floating-base] [--name NAME]
"""
import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from robotoc_tpu.models.serialize import save_json
from robotoc_tpu.models.urdf import parse_urdf


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("urdf")
    ap.add_argument("out")
    ap.add_argument("--floating-base", action="store_true")
    ap.add_argument("--name", default=None)
    args = ap.parse_args()
    spec = parse_urdf(args.urdf, args.floating_base, args.name)
    save_json(spec, args.out)
    print(f"{spec.name}: nq={spec.nq} nv={spec.nv} "
          f"joints={len(spec.joints)} frames={len(spec.frames)} -> {args.out}")


if __name__ == "__main__":
    main()
