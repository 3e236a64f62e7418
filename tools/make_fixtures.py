"""Regenerate the synthetic fixture datasets under data/.

The environment's scratch storage (data/, exps/, /tmp) does not survive
between sessions — only the repo does.  This script records the exact
fixture recipes the configs expect so a fresh session can rebuild them:

- data/fake_zju   — 3 views (2 train + 1 held-out), 4 frames, 512^2;
                    used by inb_fake / inb_fake_full (configs/inb).
- data/fake_zju5  — 5 views (4 train + 1 held-out), 6 frames (frames 4-5
                    reserved for the novel-pose protocol), 512^2; used by
                    inb_fake_mv / inb_fake_mv_np.

Both are rendered with 4x4 supersampled GT + procedural texture (the
round-2 held-out ceiling was the aliased hard-silhouette fixture).
Reference protocol being emulated: ZJU-MoCap layout as consumed by
/root/reference/lib/datasets/tpose_dataset.py.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from instant_nvr_tpu.datasets.fake_zju import write_fake_dataset


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", choices=["fake_zju", "fake_zju5", "fake_zju_big"],
                    default=None)
    args = ap.parse_args()
    if args.only in (None, "fake_zju"):
        print("writing data/fake_zju (3 views x 4 frames, 512^2) ...")
        write_fake_dataset("data/fake_zju", n_frames=4, n_views=3,
                           H=512, W=512, supersample=4, texture=True)
    if args.only in (None, "fake_zju5"):
        print("writing data/fake_zju5 (5 views x 6 frames, 512^2) ...")
        write_fake_dataset("data/fake_zju5", n_frames=6, n_views=5,
                           H=512, W=512, supersample=4, texture=True)
    if args.only == "fake_zju_big":
        # reference-scale operating point (round-4 rehearsal): SMPL-scale
        # vertex count (6,890), ~100 frames, 5 views, 1024^2 images trained
        # at ratio 0.5 — the regime of /root/reference/configs/inb/
        # inb_377.yaml:43-45,173,193.  ss=2 at 1024^2 gives the same 4x4
        # effective GT supersampling per ratio-0.5 train pixel as ss=4 at
        # 512^2; grid=32 makes per-frame pbw volumes device-LRU-relevant.
        print("writing data/fake_zju_big (5 views x 100 frames, 1024^2, "
              "6890 verts) ...")
        write_fake_dataset("data/fake_zju_big", n_frames=100, n_views=5,
                           n_verts=6890, H=1024, W=1024, supersample=2,
                           texture=True, grid=32)
    print("done")


if __name__ == "__main__":
    main()
