"""Export the interactive HTML map viewer from a checkpoint.

Usage:
  python tools/view_map.py <checkpoint.npz> [--gmm v1|v2|/path.gmm]
                           [--out map.html]

Viewer parity for the reference's live visualizer (visualizer.cpp) over
the checkpoint format instead of a ROS topic — open the HTML in any
browser, no server or network needed.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # pure host tool

from gmmloc_tpu.config import euroc_v1_config
from gmmloc_tpu.eval import synthetic
from gmmloc_tpu.mapping.map_state import MapState
from gmmloc_tpu.pipeline import checkpoint, html_viewer
from gmmloc_tpu.utils import proto


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--gmm", default=None,
                    help="v1 | v2 | path to a .gmm proto stream")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    cfg = euroc_v1_config()
    world = MapState(cfg)
    checkpoint.load_checkpoint(args.ckpt, world)

    gmm = None
    if args.gmm:
        path = {"v1": synthetic.V1_GMM, "v2": synthetic.V2_GMM}.get(
            args.gmm, args.gmm
        )
        means, covs, _, _ = proto.load_gmm_file(path)
        gmm = {"means": means, "covs": covs}

    out = args.out or os.path.splitext(args.ckpt)[0] + ".html"
    html_viewer.export_html(world, out, gmm=gmm)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
