#!/usr/bin/env python
"""Full evaluation harness (reference full_eval.py).

Trains + renders + evaluates the standard benchmark suites (MipNeRF360,
Tanks&Temples, Deep Blending) by shelling out to train.py / render.py /
metrics.py with the reference's per-suite resolution flags.
"""

import os
from argparse import ArgumentParser

mipnerf360_outdoor_scenes = ["bicycle", "flowers", "garden", "stump",
                             "treehill"]
mipnerf360_indoor_scenes = ["room", "counter", "kitchen", "bonsai"]
tanks_and_temples_scenes = ["truck", "train"]
deep_blending_scenes = ["drjohnson", "playroom"]

parser = ArgumentParser(description="Full evaluation script parameters")
parser.add_argument("--skip_training", action="store_true")
parser.add_argument("--skip_rendering", action="store_true")
parser.add_argument("--skip_metrics", action="store_true")
parser.add_argument("--output_path", default="./eval")
parser.add_argument("--mipnerf360", "-m360", type=str, default=None)
parser.add_argument("--tanksandtemples", "-tat", type=str, default=None)
parser.add_argument("--deepblending", "-db", type=str, default=None)
args, _ = parser.parse_known_args()

if not args.skip_training or not args.skip_rendering:
    for name, flag in [("mipnerf360", args.mipnerf360),
                       ("tanksandtemples", args.tanksandtemples),
                       ("deepblending", args.deepblending)]:
        if flag is None:
            print(f"note: --{name} not set; its scenes will be skipped")

all_scenes = []
if args.mipnerf360:
    all_scenes.extend(mipnerf360_outdoor_scenes + mipnerf360_indoor_scenes)
if args.tanksandtemples:
    all_scenes.extend(tanks_and_temples_scenes)
if args.deepblending:
    all_scenes.extend(deep_blending_scenes)

if not args.skip_training:
    common_args = " --quiet --eval --test_iterations -1 --disable_viewer"
    if args.mipnerf360:
        for scene in mipnerf360_outdoor_scenes:
            source = args.mipnerf360 + "/" + scene
            os.system("python train.py -s " + source + " -i images_4 -m "
                      + args.output_path + "/" + scene + common_args)
        for scene in mipnerf360_indoor_scenes:
            source = args.mipnerf360 + "/" + scene
            os.system("python train.py -s " + source + " -i images_2 -m "
                      + args.output_path + "/" + scene + common_args)
    if args.tanksandtemples:
        for scene in tanks_and_temples_scenes:
            source = args.tanksandtemples + "/" + scene
            os.system("python train.py -s " + source + " -m "
                      + args.output_path + "/" + scene + common_args)
    if args.deepblending:
        for scene in deep_blending_scenes:
            source = args.deepblending + "/" + scene
            os.system("python train.py -s " + source + " -m "
                      + args.output_path + "/" + scene + common_args)

if not args.skip_rendering:
    all_sources = []
    if args.mipnerf360:
        all_sources += [args.mipnerf360 + "/" + s
                        for s in mipnerf360_outdoor_scenes]
        all_sources += [args.mipnerf360 + "/" + s
                        for s in mipnerf360_indoor_scenes]
    if args.tanksandtemples:
        all_sources += [args.tanksandtemples + "/" + s
                        for s in tanks_and_temples_scenes]
    if args.deepblending:
        all_sources += [args.deepblending + "/" + s
                        for s in deep_blending_scenes]
    common_args = " --quiet --eval --skip_train"
    for scene, source in zip(all_scenes, all_sources):
        os.system("python render.py --iteration 7000 -s " + source + " -m "
                  + args.output_path + "/" + scene + common_args)
        os.system("python render.py --iteration 30000 -s " + source + " -m "
                  + args.output_path + "/" + scene + common_args)

if not args.skip_metrics and all_scenes:
    scenes_string = " ".join(f'"{args.output_path}/{s}"' for s in all_scenes)
    os.system("python metrics.py -m " + scenes_string)
