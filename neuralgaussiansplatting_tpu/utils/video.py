"""Training-time video rendering along fixed trajectories.

Behavioral parity target: reference utils/video_utils.py —
``render_video_frames`` (:13-159: renders Scene.video_cameras every N
iterations, rgb/depth/colmap modes, archives history tensors every 36th frame
to .npz) and ``create_video_from_frames`` (:161-194, mp4v 30fps), plus the
depth histogram plot (:196-218).
"""

from __future__ import annotations

import os

import numpy as np


def render_video_frames(scene, gaussians, net_params, iteration, model_path,
                        sw: int = 2, modes=("rgb",), archive_every: int = 36):
    """Render every video camera with the selected neural path; write PNG
    frames under <model>/video/iter_<N>/<mode>/ and archive intermediate
    tensors for the inspector GUI every ``archive_every`` frames."""
    import jax.numpy as jnp
    from PIL import Image
    from neuralgaussiansplatting_tpu.train.neural_loop import RENDER_FNS

    cams = scene.get_video_cameras()
    if not cams:
        return []
    render_fn = RENDER_FNS[sw]
    outdir = os.path.join(model_path, "video", f"iter_{iteration}")
    frames = []
    for mode in modes:
        os.makedirs(os.path.join(outdir, mode), exist_ok=True)
    for fi, cam in enumerate(cams):
        out = render_fn(cam.params(), gaussians.params, net_params,
                        alive=gaussians.state.alive)
        for mode in modes:
            if mode == "rgb":
                img = np.asarray(jnp.clip(out["render"], 0, 1))
                arr = (img.transpose(1, 2, 0) * 255).astype(np.uint8)
            elif mode == "depth":
                d = np.asarray(out["depthmap"])
                dmax = d.max() if d.max() > 0 else 1.0
                arr = (np.stack([d / dmax] * 3, -1) * 255).astype(np.uint8)
            elif mode == "colmap":
                arr = ((np.asarray(out["colmap"]) * 0.5 + 0.5)
                       * 255).astype(np.uint8)
            else:
                raise ValueError(mode)
            path = os.path.join(outdir, mode, f"frame_{fi:04d}.png")
            Image.fromarray(arr).save(path)
            frames.append(path)
        if archive_every and fi % archive_every == 0:
            arch = {"featuremap": np.asarray(out["featuremap"])}
            if "denoiser" in out:
                arch["denoiser"] = np.asarray(out["denoiser"])
            if "aggregation" in out:
                arch["aggregation"] = np.asarray(out["aggregation"])
            np.savez_compressed(
                os.path.join(outdir, f"archive_{fi:04d}.npz"), **arch)
    return frames


def create_video_from_frames(frame_dir, output_path, fps: int = 30):
    """PNG frame directory -> mp4 (reference :161-194)."""
    import cv2

    frames = sorted(f for f in os.listdir(frame_dir) if f.endswith(".png"))
    if not frames:
        return None
    first = cv2.imread(os.path.join(frame_dir, frames[0]))
    h, w = first.shape[:2]
    writer = cv2.VideoWriter(
        output_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    for f in frames:
        writer.write(cv2.imread(os.path.join(frame_dir, f)))
    writer.release()
    return output_path


def save_depth_histogram(depthmap, path, bins: int = 50):
    """Depth distribution plot (reference :196-218)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    d = np.asarray(depthmap).reshape(-1)
    d = d[d > 0]
    fig, ax = plt.subplots(figsize=(6, 4))
    if len(d):
        ax.hist(d, bins=bins)
    ax.set_xlabel("depth")
    ax.set_ylabel("pixels")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=100)
    plt.close(fig)
    return path
