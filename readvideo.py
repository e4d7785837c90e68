#!/usr/bin/env python
"""NPZ archive inspector GUI (reference readvideo.py).

Tkinter app: load the per-frame .npz archives written during neural training
(utils/video.py), scrub frames with a slider, and hover the mouse over the
image to inspect the per-pixel 9x9 denoiser kernels / 64-d feature vectors /
aggregation values around the cursor (reference readvideo.py:117-197).
"""

import os
import sys
from argparse import ArgumentParser

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def load_archives(video_dir):
    """Collect archive_*.npz files under a video/iter_* directory."""
    out = []
    for name in sorted(os.listdir(video_dir)):
        if name.startswith("archive_") and name.endswith(".npz"):
            out.append(os.path.join(video_dir, name))
    return out


def format_pixel_report(archive, y, x):
    """Text report of the stored tensors at one pixel."""
    lines = [f"pixel ({x}, {y})"]
    if "featuremap" in archive:
        f = archive["featuremap"]
        if 0 <= y < f.shape[0] and 0 <= x < f.shape[1]:
            v = f[y, x]
            lines.append(f"featuremap[0] (depth): {v[0]:.4f}")
            lines.append("PE[1:25] head: "
                         + " ".join(f"{t:.3f}" for t in v[1:7]))
            lines.append("features[25:31]: "
                         + " ".join(f"{t:.3f}" for t in v[25:31]))
    if "denoiser" in archive:
        d = archive["denoiser"]
        if 0 <= y < d.shape[0] and 0 <= x < d.shape[1]:
            k = d[y, x].reshape(9, 9)
            lines.append("denoiser 9x9 kernel (center row): "
                         + " ".join(f"{t:.3f}" for t in k[4]))
            lines.append(f"kernel sum: {k.sum():.4f}")
    if "aggregation" in archive:
        a = archive["aggregation"]
        if 0 <= y < a.shape[0] and 0 <= x < a.shape[1]:
            lines.append("aggregation rgb: "
                         + " ".join(f"{t:.3f}" for t in a[y, x]))
    return "\n".join(lines)


def main():
    parser = ArgumentParser()
    parser.add_argument("--video_dir", required=True,
                        help="a <model>/video/iter_N directory")
    args = parser.parse_args()

    archives = load_archives(args.video_dir)
    if not archives:
        print(f"no archive_*.npz under {args.video_dir}")
        return 1

    try:
        import tkinter as tk
        from PIL import Image, ImageTk
    except Exception as e:
        print(f"GUI unavailable ({e}); dumping text reports instead")
        for path in archives:
            with np.load(path) as z:
                a = {k: z[k] for k in z.files}
            h, w = a["featuremap"].shape[:2]
            print(f"== {os.path.basename(path)} ==")
            print(format_pixel_report(a, h // 2, w // 2))
        return 0

    root = tk.Tk()
    root.title("NGS archive inspector")
    state = {"idx": 0, "archive": None, "photo": None}

    label = tk.Label(root)
    label.pack()
    info = tk.Text(root, height=8, width=80)
    info.pack()

    def load(idx):
        with np.load(archives[idx]) as z:
            state["archive"] = {k: z[k] for k in z.files}
        f = state["archive"]["featuremap"]
        # display the depth channel as the scrub image
        d = f[..., 0]
        dmax = d.max() if d.max() > 0 else 1.0
        img = (np.stack([d / dmax] * 3, -1) * 255).astype(np.uint8)
        state["photo"] = ImageTk.PhotoImage(Image.fromarray(img))
        label.configure(image=state["photo"])

    def on_slide(v):
        state["idx"] = int(float(v))
        load(state["idx"])

    def on_motion(event):
        if state["archive"] is None:
            return
        info.delete("1.0", tk.END)
        info.insert("1.0", format_pixel_report(
            state["archive"], event.y, event.x))

    slider = tk.Scale(root, from_=0, to=len(archives) - 1,
                      orient=tk.HORIZONTAL, command=on_slide)
    slider.pack(fill=tk.X)
    label.bind("<Motion>", on_motion)
    load(0)
    root.mainloop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
