#!/usr/bin/env python
"""Camera-trajectory generators for video rendering.

Produces ``transforms_video.json`` files in the NeRF-synthetic format
(``camera_angle_x`` + OpenGL camera-to-world ``transform_matrix`` per frame),
matching the reference's shipped trajectory families (transforms_video/
{0lines3_10, 45lines3_10, rotate2} and blender_scripts/): radial lines at a
fixed azimuth/elevation, 360-degree orbits, and random shell views.
"""

from __future__ import annotations

import json
import math
import os
from argparse import ArgumentParser

import numpy as np


def look_at_c2w(position, target=(0.0, 0.0, 0.0), up=(0.0, 0.0, 1.0)):
    """OpenGL camera-to-world (x right, y up, z backward) looking at target."""
    pos = np.asarray(position, np.float64)
    fwd = np.asarray(target, np.float64) - pos
    fwd /= np.linalg.norm(fwd)
    up = np.asarray(up, np.float64)
    right = np.cross(fwd, up)
    if np.linalg.norm(right) < 1e-8:
        right = np.array([1.0, 0.0, 0.0])
    right /= np.linalg.norm(right)
    true_up = np.cross(right, fwd)
    c2w = np.eye(4)
    c2w[:3, 0] = right
    c2w[:3, 1] = true_up
    c2w[:3, 2] = -fwd
    c2w[:3, 3] = pos
    return c2w


def line_trajectory(views=360, r_start=3.0, r_end=10.0, azimuth_deg=0.0,
                    elevation_deg=45.0):
    """Linear radial move (reference test_view_line.py / {0,45}lines3_10)."""
    frames = []
    az = math.radians(azimuth_deg)
    el = math.radians(elevation_deg)
    for i in range(views):
        r = r_start + (r_end - r_start) * i / max(views - 1, 1)
        pos = (r * math.cos(el) * math.cos(az),
               r * math.cos(el) * math.sin(az),
               r * math.sin(el))
        frames.append((f"frame_{i:04d}", look_at_c2w(pos), pos, r, i))
    return frames


def orbit_trajectory(views=60, radius=4.0, elevation_deg=30.0):
    """360-degree orbit (reference 360_view_test.py / rotate2)."""
    frames = []
    el = math.radians(elevation_deg)
    for i in range(views):
        az = 2 * math.pi * i / views
        pos = (radius * math.cos(el) * math.cos(az),
               radius * math.cos(el) * math.sin(az),
               radius * math.sin(el))
        frames.append((f"frame_{i:04d}", look_at_c2w(pos), pos, radius, i))
    return frames


def shell_trajectory(views=360, r_min=3.0, r_max=10.0, seed=0,
                     upper_only=True):
    """Random views in a radius shell (reference ball_view.py)."""
    rng = np.random.default_rng(seed)
    frames = []
    for i in range(views):
        r = rng.uniform(r_min, r_max)
        az = rng.uniform(0, 2 * math.pi)
        el = math.asin(rng.uniform(0 if upper_only else -1, 1))
        pos = (r * math.cos(el) * math.cos(az),
               r * math.cos(el) * math.sin(az),
               r * math.sin(el))
        frames.append((f"frame_{i:04d}", look_at_c2w(pos), pos, r, i))
    return frames


def write_transforms(frames, out_dir, camera_angle_x=0.6911112070083618,
                     info=None):
    os.makedirs(out_dir, exist_ok=True)
    payload = {
        "camera_angle_x": camera_angle_x,
        "trajectory_info": info or {},
        "frames": [
            {
                "file_path": name,
                "camera_position": list(map(float, pos)),
                "radius": float(r),
                "frame_number": idx,
                "transform_matrix": c2w.tolist(),
            }
            for name, c2w, pos, r, idx in frames
        ],
    }
    path = os.path.join(out_dir, "transforms_video.json")
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)
    return path


def main():
    parser = ArgumentParser()
    parser.add_argument("--out", default="transforms_video")
    parser.add_argument("--views", type=int, default=360)
    args = parser.parse_args()
    write_transforms(
        line_trajectory(args.views, azimuth_deg=0),
        os.path.join(args.out, "0lines3_10"),
        info={"type": "line", "azimuth": 0, "elevation": 45})
    write_transforms(
        line_trajectory(args.views, azimuth_deg=45),
        os.path.join(args.out, "45lines3_10"),
        info={"type": "line", "azimuth": 45, "elevation": 45})
    write_transforms(
        orbit_trajectory(60),
        os.path.join(args.out, "rotate2"),
        info={"type": "orbit", "radius": 4.0})
    print(f"wrote trajectories under {args.out}/")


if __name__ == "__main__":
    main()
