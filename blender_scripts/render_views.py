# Blender dataset generator (runs inside Blender: `blender scene.blend -b -P
# render_views.py -- --mode orbit`). TPU-framework port of the reference's
# three generators (blender_scripts/360_view_test.py, ball_view.py,
# test_view_line.py): renders RGB (+ optional depth/normal passes) along a
# chosen camera trajectory and writes transforms_*.json in the
# NeRF-synthetic format consumed by scene/dataset_readers.py.

import argparse
import json
import math
import os
import sys

import bpy
import numpy as np


def parse_args():
    argv = sys.argv[sys.argv.index("--") + 1:] if "--" in sys.argv else []
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["orbit", "shell", "line"],
                   default="orbit")
    p.add_argument("--views", type=int, default=60)
    p.add_argument("--resolution", type=int, default=400)
    p.add_argument("--out", default="pic_gen_src")
    p.add_argument("--radius", type=float, default=4.0)
    p.add_argument("--radius_end", type=float, default=10.0)
    p.add_argument("--elevation", type=float, default=45.0)
    p.add_argument("--azimuth", type=float, default=0.0)
    p.add_argument("--upper_views", action="store_true", default=True)
    p.add_argument("--depth", action="store_true",
                   help="also write depth + normal passes")
    p.add_argument("--split", default="train")
    return p.parse_args(argv)


def listify_matrix(matrix):
    return [list(row) for row in matrix]


def camera_position(mode, i, views, args, rng):
    el = math.radians(args.elevation)
    if mode == "orbit":
        az = 2 * math.pi * i / views
        r = args.radius
    elif mode == "line":
        az = math.radians(args.azimuth)
        r = args.radius + (args.radius_end - args.radius) * i / max(views - 1, 1)
    else:  # shell
        az = rng.uniform(0, 2 * math.pi)
        el = math.asin(rng.uniform(0 if args.upper_views else -1, 1))
        r = rng.uniform(args.radius, args.radius_end)
    return (r * math.cos(el) * math.cos(az),
            r * math.cos(el) * math.sin(az),
            r * math.sin(el))


def main():
    args = parse_args()
    rng = np.random.default_rng(0)
    scene = bpy.context.scene
    out_dir = bpy.path.abspath(f"//{args.out}")
    os.makedirs(out_dir, exist_ok=True)

    scene.render.resolution_x = args.resolution
    scene.render.resolution_y = args.resolution
    scene.render.resolution_percentage = 100
    scene.render.image_settings.file_format = "PNG"
    scene.render.film_transparent = True

    cam_obj = bpy.data.objects["Camera"]
    cam_obj.rotation_mode = "QUATERNION"

    if args.depth:
        scene.use_nodes = True
        scene.view_layers[0].use_pass_z = True
        scene.view_layers[0].use_pass_normal = True
        tree = scene.node_tree
        rl = tree.nodes.new("CompositorNodeRLayers")
        depth_out = tree.nodes.new("CompositorNodeOutputFile")
        depth_out.base_path = out_dir
        depth_out.file_slots[0].path = "depth_"
        tree.links.new(rl.outputs["Depth"], depth_out.inputs[0])

    frames = []
    for i in range(args.views):
        pos = camera_position(args.mode, i, args.views, args, rng)
        cam_obj.location = pos
        cam_obj.rotation_quaternion = _look_at_quat(pos)  # aim at the origin
        name = f"r_{i}"
        scene.render.filepath = os.path.join(out_dir, name)
        bpy.ops.render.render(write_still=True)
        frames.append({
            "file_path": f"./{args.out}/{name}",
            "transform_matrix": listify_matrix(cam_obj.matrix_world),
        })

    payload = {
        "camera_angle_x": bpy.data.objects["Camera"].data.angle_x,
        "frames": frames,
    }
    with open(bpy.path.abspath(f"//transforms_{args.split}.json"), "w") as f:
        json.dump(payload, f, indent=4)


def _look_at_quat(pos):
    import mathutils
    direction = mathutils.Vector((0, 0, 0)) - mathutils.Vector(pos)
    return direction.to_track_quat("-Z", "Y")


if __name__ == "__main__":
    main()
