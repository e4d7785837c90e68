#!/usr/bin/env python
"""Sub-stage bisection of bin_gaussians + the sort-based grad reduce at the
800^2 bench shape. Each row cumulatively enables more of the pipeline."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/ngs-jax-cache")

import jax
import jax.numpy as jnp
import numpy as np

from tools.chain_bench import chain
from neuralgaussiansplatting_tpu.models import gaussians as gm
from neuralgaussiansplatting_tpu.ops import preprocess as pp
from neuralgaussiansplatting_tpu.ops import binning
from neuralgaussiansplatting_tpu.ops import blend_pallas as bp
from __graft_entry__ import _demo_scene


def main():
    w = h = 800
    capacity = 1216 * 1024
    kcap = 1344 * 1024
    align = 128
    max_per_tile = 2048
    tiles_x = tiles_y = 50
    num_tiles = tiles_x * tiles_y
    n = 100_000

    params, state, cam = _demo_scene(n=n, w=w, h=h, sh_degree=3)
    alive = state.alive
    pre0 = jax.jit(lambda p: pp.preprocess_gaussians(
        p.xyz, gm.get_scaling(p), gm.get_rotation(p),
        gm.get_opacity(p, alive), gm.get_features(p), 3, cam, 16, 16,
        tight=True))(params)
    pre0 = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), pre0)

    def stage(upto):
        def run(pre, s):
            tiles_touched = pre.tiles_touched
            offsets = jnp.cumsum(tiles_touched)
            num_rendered = offsets[-1]
            starts = offsets - tiles_touched
            rect_w = jnp.maximum(pre.rect_max[:, 0] - pre.rect_min[:, 0], 1)
            packed_rect = (pre.rect_min[:, 0] * (1 << 20)
                           + pre.rect_min[:, 1] * (1 << 10) + rect_w)
            depth_bits = jax.lax.bitcast_convert_type(
                pre.depths + s, jnp.int32)
            fields = jnp.stack([
                jnp.arange(n, dtype=jnp.int32), starts, packed_rect,
                depth_bits], axis=1).astype(jnp.int32)
            ex = binning._expand_runs(fields, starts, capacity)
            slots = jnp.arange(capacity, dtype=jnp.int32)
            in_range = slots < num_rendered
            local = slots - ex[:, 1]
            rw = jnp.maximum(ex[:, 2] & 1023, 1)
            tx = jax.lax.shift_right_logical(ex[:, 2], 20) + local % rw
            ty = (jax.lax.shift_right_logical(ex[:, 2], 10) & 1023) + local // rw
            tile = jnp.where(in_range, ty * tiles_x + tx,
                             num_tiles).astype(jnp.int32)
            gid_slot = jnp.where(in_range, ex[:, 0], n)
            if upto == "expand":
                return (tile.sum() + gid_slot.sum() + ex[:, 3].sum())

            tile_bits = max(int(num_tiles + 1).bit_length(), 1)
            dbk = 31 - tile_bits
            dq = jax.lax.shift_right_logical(ex[:, 3], 31 - dbk)
            key = tile * (1 << dbk) + dq
            key = jnp.where(in_range, key, jnp.iinfo(jnp.int32).max)
            sorted_key, sorted_gid, sorted_e = jax.lax.sort(
                (key, gid_slot, slots), num_keys=1)
            sorted_tile = jnp.where(
                sorted_key == jnp.iinfo(jnp.int32).max, num_tiles,
                jax.lax.shift_right_logical(sorted_key, dbk))
            if upto == "sort":
                return (sorted_tile.sum() + sorted_gid.sum() + sorted_e.sum())

            tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
            raw_start = jnp.searchsorted(sorted_tile, tile_ids,
                                         side="left").astype(jnp.int32)
            raw_end = jnp.searchsorted(sorted_tile, tile_ids,
                                       side="right").astype(jnp.int32)
            raw_count = raw_end - raw_start
            if upto == "ranges":
                return raw_start.sum() + raw_count.sum() + sorted_gid.sum()

            count_eff = jnp.minimum(raw_count, max_per_tile)
            seg = ((count_eff + align - 1) // align) * align
            seg_end = jnp.cumsum(seg)
            aligned_start = seg_end - seg
            drop = seg_end > kcap
            count_eff = jnp.where(drop, 0, count_eff)
            seg = jnp.where(drop, 0, seg)
            seg_end = jnp.cumsum(seg)
            aligned_start = seg_end - seg
            total = seg_end[num_tiles - 1]
            kslots = jnp.arange(kcap, dtype=jnp.int32)
            tfields = jnp.stack(
                [raw_start - aligned_start, raw_start + count_eff], axis=1)
            ex2 = binning._expand_runs(tfields, aligned_start, kcap)
            src = kslots + ex2[:, 0]
            valid = (kslots < total) & (src < ex2[:, 1])
            if upto == "repack_expand":
                return src.sum() + valid.sum() + sorted_gid.sum()

            gathered = binning._gather_aligned_runs(sorted_gid, src[::128], 128)
            gathered_e = binning._gather_aligned_runs(sorted_e, src[::128], 128)
            gid_aligned = jnp.where(valid, gathered, n).astype(jnp.int32)
            eid_aligned = jnp.where(valid, gathered_e, capacity).astype(jnp.int32)
            return gid_aligned.sum() + eid_aligned.sum()
        return run

    def mk(upto):
        def body(carry, s):
            pre, acc = carry
            return (pre, acc + stage(upto)(pre, s * 1e-30))
        return body

    x0 = (pre0, jnp.zeros(()))
    for upto in ["expand", "sort", "ranges", "repack_expand", "full"]:
        ms = chain(lambda b=mk(upto): b, x0, iters=8, reps=2)
        print(f"  binning upto {upto:14s} {ms:7.2f} ms", flush=True)

    # ---- grad reduce bisection ----
    rng = np.random.default_rng(0)
    kept = 1_130_000
    cot9 = jnp.asarray(rng.normal(size=(9, kcap)).astype(np.float32))
    eid = np.full(kcap, capacity, np.int32)
    eid[:kept] = rng.permutation(kept).astype(np.int32)
    eid = jnp.asarray(eid)
    counts = rng.integers(0, 23, size=n).astype(np.int32)
    counts = (counts * (kept / counts.sum())).astype(np.int32)
    gstart = jnp.asarray(np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32))
    gcount = jnp.asarray(counts)

    def red_sortonly(c, s):
        ops = (eid,) + tuple(c[i] + s for i in range(9))
        srt = jax.lax.sort(ops, num_keys=1)
        return sum(o.sum() for o in srt[1:])

    def red_full(c, s):
        g = bp._reduce_sorted(c + s, eid, gstart, gcount)
        return g.sum()

    def red_drop(c, s):
        g = bp._reduce_sorted_dropped(c + s, eid, gstart, gcount)
        return g.sum()

    def red_scatter(c, s):
        gid = jnp.asarray(rng.integers(0, n, kcap, dtype=np.int32))
        def f(c, s):
            g = bp._reduce_scatter(c + s, gid, n)
            return g.sum()
        return f

    for name, fn in [("reduce sort-only", red_sortonly),
                     ("reduce full", red_full),
                     ("reduce drop-tolerant", red_drop)]:
        def body(carry, s, fn=fn):
            c, acc = carry
            return (c, acc + fn(c, s * 1e-30))
        ms = chain(lambda b=body: b, (cot9, jnp.zeros(())), iters=8, reps=2)
        print(f"  {name:22s} {ms:7.2f} ms", flush=True)


if __name__ == "__main__" and "variants" not in sys.argv:
    main()


def expand_variants():
    """Finer bisection inside the 'expand' stage + an int-div-free variant."""
    import jax, jax.numpy as jnp, numpy as np
    from tools.chain_bench import chain
    from neuralgaussiansplatting_tpu.ops import preprocess as pp
    from neuralgaussiansplatting_tpu.models import gaussians as gm
    from neuralgaussiansplatting_tpu.ops import binning
    from __graft_entry__ import _demo_scene

    w = h = 800
    capacity = 1216 * 1024
    tiles_x = tiles_y = 50
    num_tiles = tiles_x * tiles_y
    n = 100_000
    params, state, cam = _demo_scene(n=n, w=w, h=h, sh_degree=3)
    pre0 = jax.jit(lambda p: pp.preprocess_gaussians(
        p.xyz, gm.get_scaling(p), gm.get_rotation(p),
        gm.get_opacity(p, state.alive), gm.get_features(p), 3, cam, 16, 16,
        tight=True))(params)
    pre0 = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), pre0)

    def common(pre, s):
        tiles_touched = pre.tiles_touched
        offsets = jnp.cumsum(tiles_touched)
        starts = offsets - tiles_touched
        rect_w = jnp.maximum(pre.rect_max[:, 0] - pre.rect_min[:, 0], 1)
        packed_rect = (pre.rect_min[:, 0] * (1 << 20)
                       + pre.rect_min[:, 1] * (1 << 10) + rect_w)
        depth_bits = jax.lax.bitcast_convert_type(pre.depths + s, jnp.int32)
        fields = jnp.stack([
            jnp.arange(n, dtype=jnp.int32), starts, packed_rect,
            depth_bits], axis=1).astype(jnp.int32)
        ex = binning._expand_runs(fields, starts, capacity)
        return ex, offsets[-1]

    def row_exonly(pre, s):
        ex, nr = common(pre, s)
        return ex[:, 0].sum() + ex[:, 2].sum() + ex[:, 3].sum() + nr

    def row_intdiv(pre, s):
        ex, nr = common(pre, s)
        slots = jnp.arange(capacity, dtype=jnp.int32)
        in_range = slots < nr
        local = slots - ex[:, 1]
        rw = jnp.maximum(ex[:, 2] & 1023, 1)
        tx = jax.lax.shift_right_logical(ex[:, 2], 20) + local % rw
        ty = (jax.lax.shift_right_logical(ex[:, 2], 10) & 1023) + local // rw
        tile = jnp.where(in_range, ty * tiles_x + tx, num_tiles)
        gid = jnp.where(in_range, ex[:, 0], n)
        return tile.sum() + gid.sum()

    def row_fdiv(pre, s):
        ex, nr = common(pre, s)
        slots = jnp.arange(capacity, dtype=jnp.int32)
        in_range = slots < nr
        local = slots - ex[:, 1]
        rw = jnp.maximum(ex[:, 2] & 1023, 1)
        # f32 division + one-step fixup (exact for local < 2^24)
        q = jnp.floor(local.astype(jnp.float32)
                      * (1.0 / rw.astype(jnp.float32))).astype(jnp.int32)
        r = local - q * rw
        q = q + (r >= rw).astype(jnp.int32) - (r < 0).astype(jnp.int32)
        r = local - q * rw
        tx = jax.lax.shift_right_logical(ex[:, 2], 20) + r
        ty = (jax.lax.shift_right_logical(ex[:, 2], 10) & 1023) + q
        tile = jnp.where(in_range, ty * tiles_x + tx, num_tiles)
        gid = jnp.where(in_range, ex[:, 0], n)
        return tile.sum() + gid.sum()

    for name, fn in [("ex only", row_exonly), ("ex+intdiv", row_intdiv),
                     ("ex+fdiv", row_fdiv)]:
        def body(carry, s, fn=fn):
            pre, acc = carry
            return (pre, acc + fn(pre, s * 1e-30))
        ms = chain(lambda b=body: b, (pre0, jnp.zeros(())), iters=8, reps=2)
        print(f"  {name:12s} {ms:7.2f} ms", flush=True)

    # numeric equivalence of the fdiv decode
    ex, nr = jax.jit(common)(pre0, 0.0)
    a = jax.jit(row_intdiv)(pre0, 0.0)
    b = jax.jit(row_fdiv)(pre0, 0.0)
    print("  fdiv checksum match:", int(a) == int(b))


if __name__ == "__main__" and "variants" in sys.argv:
    expand_variants()
