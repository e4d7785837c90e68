"""Slow numpy oracle mirroring the reference CUDA rasterizer semantics.

Written directly from the algorithm described by
diff-gaussian-rasterization/cuda_rasterizer/forward.cu (preprocess 156-260,
renderCUDA 262-374) as a per-pixel Python loop — deliberately an independent
*second* implementation so the JAX/Pallas paths are validated against
something that is not them.
"""

import math

import numpy as np


def preprocess_np(means3d, scales, rotations, opacities, shs, deg,
                  view, full_proj, campos, tan_fovx, tan_fovy, W, H,
                  block_x=16, block_y=16):
    n = means3d.shape[0]
    fx = W / (2.0 * tan_fovx)
    fy = H / (2.0 * tan_fovy)
    tiles_x = (W + block_x - 1) // block_x
    tiles_y = (H + block_y - 1) // block_y

    out = []
    for i in range(n):
        p = means3d[i]
        p_view = view[:3, :3] @ p + view[:3, 3]
        if p_view[2] <= 0.2:
            continue
        hom = full_proj[:, :3] @ p + full_proj[:, 3]
        ndc = hom[:3] / (hom[3] + 1e-7)
        mx = ((ndc[0] + 1) * W - 1) * 0.5
        my = ((ndc[1] + 1) * H - 1) * 0.5

        # cov3d
        w, x, y, z = rotations[i] / np.linalg.norm(rotations[i])
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])
        L = R @ np.diag(scales[i])
        cov3d = L @ L.T

        # EWA
        t = p_view.copy()
        limx, limy = 1.3 * tan_fovx, 1.3 * tan_fovy
        t[0] = np.clip(t[0] / t[2], -limx, limx) * t[2]
        t[1] = np.clip(t[1] / t[2], -limy, limy) * t[2]
        J = np.array([
            [fx / t[2], 0, -(fx * t[0]) / (t[2] ** 2)],
            [0, fy / t[2], -(fy * t[1]) / (t[2] ** 2)],
        ])
        T = J @ view[:3, :3]
        cov2d = T @ cov3d @ T.T
        cov2d[0, 0] += 0.3
        cov2d[1, 1] += 0.3
        det = cov2d[0, 0] * cov2d[1, 1] - cov2d[0, 1] ** 2
        if det == 0:
            continue
        conic = np.array([cov2d[1, 1], -cov2d[0, 1], cov2d[0, 0]]) / det
        mid = 0.5 * (cov2d[0, 0] + cov2d[1, 1])
        disc = math.sqrt(max(0.1, mid * mid - det))
        radius = math.ceil(3.0 * math.sqrt(max(mid + disc, mid - disc)))

        rminx = min(tiles_x, max(0, int((mx - radius) / block_x)))
        rminy = min(tiles_y, max(0, int((my - radius) / block_y)))
        rmaxx = min(tiles_x, max(0, int((mx + radius + block_x - 1) / block_x)))
        rmaxy = min(tiles_y, max(0, int((my + radius + block_y - 1) / block_y)))
        if (rmaxx - rminx) * (rmaxy - rminy) == 0:
            continue

        # SH -> RGB
        d = p - campos
        d = d / np.linalg.norm(d)
        rgb = eval_sh_np(deg, shs[i], d) + 0.5
        rgb = np.maximum(rgb, 0.0)

        out.append(dict(gid=i, mx=mx, my=my, depth=p_view[2], conic=conic,
                        opacity=opacities[i], rgb=rgb, radius=radius,
                        rect=(rminx, rminy, rmaxx, rmaxy)))
    return out


SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = [1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
         -1.0925484305920792, 0.5462742152960396]
SH_C3 = [-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
         0.3731763325901154, -0.4570457994644658, 1.445305721320277,
         -0.5900435899266435]


def eval_sh_np(deg, sh, d):
    res = SH_C0 * sh[0]
    if deg > 0:
        x, y, z = d
        res = res - SH_C1 * y * sh[1] + SH_C1 * z * sh[2] - SH_C1 * x * sh[3]
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            res = (res + SH_C2[0] * x * y * sh[4] + SH_C2[1] * y * z * sh[5]
                   + SH_C2[2] * (2 * zz - xx - yy) * sh[6]
                   + SH_C2[3] * x * z * sh[7] + SH_C2[4] * (xx - yy) * sh[8])
            if deg > 2:
                res = (res + SH_C3[0] * y * (3 * xx - yy) * sh[9]
                       + SH_C3[1] * x * y * z * sh[10]
                       + SH_C3[2] * y * (4 * zz - xx - yy) * sh[11]
                       + SH_C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh[12]
                       + SH_C3[4] * x * (4 * zz - xx - yy) * sh[13]
                       + SH_C3[5] * z * (xx - yy) * sh[14]
                       + SH_C3[6] * x * (xx - 3 * yy) * sh[15])
    return res


def render_np(splats, W, H, bg, block_x=16, block_y=16):
    """Per-pixel front-to-back blend with exact CUDA loop semantics."""
    tiles_x = (W + block_x - 1) // block_x
    img = np.zeros((H, W, 3))
    final_t = np.ones((H, W))
    n_contrib = np.zeros((H, W), np.int32)

    # per-tile depth-sorted lists
    tiles = {}
    for s in splats:
        rminx, rminy, rmaxx, rmaxy = s["rect"]
        for ty in range(rminy, rmaxy):
            for tx in range(rminx, rmaxx):
                tiles.setdefault(ty * tiles_x + tx, []).append(s)
    for tid in tiles:
        tiles[tid].sort(key=lambda s: s["depth"])

    for py in range(H):
        for px in range(W):
            tid = (py // block_y) * tiles_x + (px // block_x)
            T = 1.0
            C = np.zeros(3)
            contributor = 0
            last = 0
            for s in tiles.get(tid, []):
                contributor += 1
                dx = s["mx"] - px
                dy = s["my"] - py
                con = s["conic"]
                power = -0.5 * (con[0] * dx * dx + con[2] * dy * dy) - con[1] * dx * dy
                if power > 0:
                    continue
                alpha = min(0.99, s["opacity"] * math.exp(power))
                if alpha < 1.0 / 255.0:
                    continue
                test_t = T * (1 - alpha)
                if test_t < 1e-4:
                    break
                C += s["rgb"] * alpha * T
                T = test_t
                last = contributor
            img[py, px] = C + T * bg
            final_t[py, px] = T
            n_contrib[py, px] = last
    return img, final_t, n_contrib
