"""Multi-chip communication accounting for the sharded bundle adjuster.

Compiles the observation-sharded (jit + sharding annotations) and
point-sharded (shard_map) BA on a virtual 8-device CPU mesh, dumps the
optimized HLO, and tabulates every collective op (all-reduce,
all-gather, reduce-scatter, collective-permute) with its payload bytes
— the evidence for choosing the default layout per problem scale
(VERDICT round-2 item #10; jax.sharding + psum per SURVEY §2.11).

Collectives that sit inside the LM/CG while-loops appear once in the
HLO but execute every iteration; the table groups them by payload
shape so the per-iteration cost is read off directly (camera-side
reductions are O(Nc*42) etc., independent of the observation count M —
the scaling-book property that makes BA data-parallelism efficient).

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     JAX_PLATFORMS=cpu python scripts/comm_accounting.py [n_cams n_pts]
"""
import collections
import os
import re
import sys

# always run on a virtual 8-device CPU mesh (the HLO fetch that this
# script depends on hangs through the tunneled TPU runtime, and the
# collective structure is identical). The environment pins the axon
# platform via JAX_PLATFORMS, which wins over env edits — switch
# through jax.config like tests/conftest.py.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1,
               "f64": 8, "f16": 2}
COLL_RE = re.compile(
    r"=\s*(f32|bf16|f64|f16|s32|u32|pred|\()(.*?)\s*"
    r"(all-reduce|all-gather|reduce-scatter|collective-permute|"
    r"all-to-all)\(", )
SHAPE_RE = re.compile(r"(f32|bf16|f64|f16|s32|u32|pred)\[([0-9,]*)\]")


def collective_table(hlo_text):
    rows = collections.Counter()
    byte_tot = collections.Counter()
    for line in hlo_text.splitlines():
        if " = " not in line:
            continue
        rhs = line.split(" = ", 1)[1]
        m = re.match(r"((?:[()]|tuple|token|"
                     r"f32|bf16|f64|f16|s32|u32|pred|\[|,|\]|\{[^}]*\}|"
                     r"[0-9 ])*)\s*(all-reduce|all-gather|"
                     r"reduce-scatter|collective-permute|all-to-all)"
                     r"(?:-start|-done)?\(", rhs)
        if not m:
            continue
        op = m.group(2)
        if "-done(" in rhs:
            continue  # count each async collective once (at -start)
        shapes = SHAPE_RE.findall(m.group(1))
        nbytes = 0
        desc = []
        for dt, dims_s in shapes:
            dims = [int(x) for x in dims_s.split(",") if x]
            n = 1
            for d in dims:
                n *= d
            nbytes += n * DTYPE_BYTES[dt]
            desc.append(f"{dt}[{dims_s}]")
        key = (op, "+".join(desc) or "scalar")
        rows[key] += 1
        byte_tot[key] += nbytes
    return rows, byte_tot


def analyze(tag, hlo):
    rows, byte_tot = collective_table(hlo)
    print(f"\n== {tag} ==")
    print(f"{'op':<20} {'payload':<40} {'count':>5} {'bytes_each':>12}")
    total = 0
    for (op, desc), c in sorted(rows.items(),
                                key=lambda kv: -byte_tot[kv[0]]):
        per = byte_tot[(op, desc)] // max(c, 1)
        total += byte_tot[(op, desc)]
        print(f"{op:<20} {desc:<40} {c:>5} {per:>12,}")
    print(f"total collective payload bytes (static occurrences): "
          f"{total:,}")
    return total


def main():
    n_cams = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n_pts = int(sys.argv[2]) if len(sys.argv) > 2 else 8192

    import jax
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import _make_problem
    from theiasfm_tpu.parallel import (make_mesh, shard_ba_problem,
                                       point_sharded_bundle_adjust,
                                       sharded_bundle_adjust)
    from theiasfm_tpu.parallel.point_sharded import (
        partition_problem_by_point)
    from theiasfm_tpu.sfm.ba import BAOptions, bundle_adjust

    assert len(jax.devices()) >= 8, jax.devices()
    mesh = make_mesh(jax.devices()[:8])
    prob = _make_problem(n_cams=n_cams, n_pts=n_pts, obs_per_pt=4)
    opts = BAOptions(max_iterations=3, cg_iterations=8, loss="huber",
                     loss_scale=2.0, cg_eta=0.1)

    # --- observation-sharded: jit with sharding annotations; XLA's
    # SPMD partitioner inserts the collectives
    sharded = shard_ba_problem(prob, mesh)
    fn = jax.jit(lambda p: bundle_adjust(p, opts)[1].final_cost)
    hlo_obs = fn.lower(sharded).compile().as_text()
    t1 = analyze(f"obs-sharded jit ({n_cams} cams, {n_pts} pts, 8 dev)",
                 hlo_obs)

    # --- point-sharded shard_map: explicit psums (mirrors
    # parallel/point_sharded.py wiring)
    import dataclasses
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from theiasfm_tpu.sfm.ba import BAProblem
    shards, meta = partition_problem_by_point(prob, mesh.devices.size)
    opts_ps = dataclasses.replace(opts, axis_name="obs",
                                  point_indices_sorted=True)
    cam_mask = jnp.ones(prob.extrinsics.shape[0], bool)

    def local_ba(extr, intr, cmask, obs_cam, obs_group, obs_pt,
                 obs_pix, obs_mask, points, point_mask):
        local = BAProblem(
            extrinsics=extr, intrinsics=intr, points=points,
            obs_cam=obs_cam, obs_group=obs_group, obs_pt=obs_pt,
            obs_pix=obs_pix, obs_mask=obs_mask,
            cam_mask=cmask, point_mask=point_mask)
        _, summary = bundle_adjust(local, opts_ps)
        return summary.final_cost

    rep, sh = P(), P("obs")
    fn2 = jax.jit(jax.shard_map(
        local_ba, mesh=mesh,
        in_specs=(rep, rep, rep, sh, sh, sh, sh, sh, sh, sh),
        out_specs=rep, check_vma=False))
    args = (prob.extrinsics, prob.intrinsics, cam_mask,
            jnp.asarray(shards["obs_cam"]),
            jnp.asarray(shards["obs_group"]),
            jnp.asarray(shards["obs_pt"]),
            jnp.asarray(shards["obs_pix"]),
            jnp.asarray(shards["obs_mask"]),
            jnp.asarray(shards["points"]),
            jnp.asarray(shards["point_mask"]))
    hlo_pt = fn2.lower(*args).compile().as_text()
    t2 = analyze(f"point-sharded shard_map ({n_cams} cams, "
                 f"{n_pts} pts, 8 dev)", hlo_pt)

    # --- edge-sharded view-graph stages (parallel/edge_sharded.py):
    # rotation averaging + LUD-polish GN, edges split over the mesh,
    # O(V*3) psums per CG iteration
    import numpy as np
    from theiasfm_tpu.sfm.global_pose.rotation_averaging import (
        RobustRotationOptions, _rotation_averaging_device)
    from theiasfm_tpu.sfm.global_pose.position_estimation import (
        PositionEstimatorOptions, _solve_positions)
    V = n_cams
    rng = np.random.default_rng(0)
    E = V * 8
    edges = np.stack([rng.integers(0, V, E),
                      rng.integers(0, V, E)], 1).astype(np.int32)
    edges = edges[edges[:, 0] != edges[:, 1]]
    E = (len(edges) // 8) * 8
    edges = edges[:E]
    mesh_e = make_mesh(jax.devices()[:8], axis_name="edges")
    sh_e = P("edges")
    rel = jnp.asarray(rng.normal(scale=0.1, size=(E, 3)),
                      jnp.float32)
    aa0 = jnp.asarray(rng.normal(scale=0.1, size=(V, 3)), jnp.float32)
    mask = jnp.ones(E, jnp.float32)
    ropts = RobustRotationOptions()
    fr = jax.jit(jax.shard_map(
        lambda a, b, c, d, e: _rotation_averaging_device(
            a, b, c, d, e, ropts, V, axis_name="edges"),
        mesh=mesh_e, in_specs=(rep, sh_e, sh_e, sh_e, sh_e),
        out_specs=rep, check_vma=False))
    hlo_rot = fr.lower(aa0, jnp.asarray(edges[:, 0]),
                       jnp.asarray(edges[:, 1]), rel,
                       mask).compile().as_text()
    t3 = analyze(f"edge-sharded rotation averaging ({V} views, "
                 f"{E} edges, 8 dev)", hlo_rot)

    t_dir = jnp.asarray(rng.normal(size=(E, 3)), jnp.float32)
    t_dir = t_dir / jnp.linalg.norm(t_dir, axis=1, keepdims=True)
    popts2 = PositionEstimatorOptions()
    fp = jax.jit(jax.shard_map(
        lambda a, b, c, d, e: _solve_positions(
            a, b, c, d, e, popts2, V, "lud", axis_name="edges"),
        mesh=mesh_e, in_specs=(rep, sh_e, sh_e, sh_e, sh_e),
        out_specs=rep, check_vma=False))
    hlo_pos = fp.lower(
        jnp.asarray(rng.normal(size=(V, 3)), jnp.float32),
        jnp.asarray(edges[:, 0]), jnp.asarray(edges[:, 1]), t_dir,
        mask).compile().as_text()
    t4 = analyze(f"edge-sharded LUD positions ({V} views, "
                 f"{E} edges, 8 dev)", hlo_pos)

    print("\nSummary: obs-sharded total(static)={:,}B  "
          "point-sharded total(static)={:,}B  "
          "edge-sharded rotation={:,}B  positions={:,}B".format(
              t1, t2, t3, t4))


if __name__ == "__main__":
    main()
