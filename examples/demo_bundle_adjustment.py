"""Plane/edge feature extraction + EVM / LSQ bundle adjustment on the
newer_01 clouds (reference: src/demo/demo_bundle_adjustment.cpp — pick a
feature region across keyframes, minimize scatter eigenvalues over poses).

Here: seed plane features from the plane clouds (region growing), seed edge
features from the edge clouds, build PlaneEVM / EdgeEVM / LSQ-BA factors over
all 5 keyframes, optimize from noised GT, report pose errors.

Run: python examples/demo_bundle_adjustment.py [--platform cpu]
"""

from _common import DATA, setup


def main():
    setup(__doc__)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gtsam_points_tpu.factors import PriorFactor, make_evm_factor, make_lsq_ba_factor
    from gtsam_points_tpu.optim import FactorGraph, optimize_lm
    from gtsam_points_tpu.optim.lm import LMParams
    from gtsam_points_tpu.utils import io, se3

    N = 5
    gt = io.load_graph(f"{DATA}/newer_01/graph.txt")
    T_gt = np.asarray(se3.pose_from_xyzq(jnp.asarray(gt)))[:N]
    planes = [io.read_points(f"{DATA}/newer_01/planes_{i * 10:06d}.bin") for i in range(N)]
    edges = [io.read_points(f"{DATA}/newer_01/edges_{i * 10:06d}.bin") for i in range(N)]

    rng = np.random.RandomState(0)

    def feature_patch(clouds, center_w, radius):
        """Collect each keyframe's local points whose world position (under GT)
        falls inside a ball — one multi-keyframe feature."""
        per_key = {}
        for k in range(N):
            pw = clouds[k] @ T_gt[k][:3, :3].T + T_gt[k][:3, 3]
            m = np.linalg.norm(pw - center_w, axis=1) < radius
            if m.sum() >= 10:
                per_key[k] = clouds[k][m][:256]
        return per_key if len(per_key) >= 3 else None

    # sample candidate feature centers from keyframe-0 world points
    pw0 = planes[0] @ T_gt[0][:3, :3].T + T_gt[0][:3, 3]
    plane_feats, edge_feats = [], []
    for _ in range(200):
        c = pw0[rng.randint(len(pw0))]
        f = feature_patch(planes, c, 1.0)
        if f and len(plane_feats) < 12:
            plane_feats.append(f)
        if len(plane_feats) >= 12:
            break
    ew0 = edges[0] @ T_gt[0][:3, :3].T + T_gt[0][:3, 3]
    for _ in range(200):
        c = ew0[rng.randint(len(ew0))]
        f = feature_patch(edges, c, 1.0)
        if f and len(edge_feats) < 8:
            edge_feats.append(f)
        if len(edge_feats) >= 8:
            break
    print(f"features: {len(plane_feats)} planes, {len(edge_feats)} edges")

    def moments(per_key):
        out = {}
        for k, pts in per_key.items():
            mu = pts.mean(0)
            d = pts - mu
            out[k] = (len(pts), mu, d.T @ d / len(pts))
        return out

    def noised(sigma=0.03):
        r = np.random.RandomState(1)
        out = [T_gt[0]]
        for i in range(1, N):
            xi = jnp.asarray(r.randn(6).astype(np.float32) * sigma)
            out.append(np.asarray(jnp.asarray(T_gt[i]) @ se3.se3_exp(xi)))
        return jnp.asarray(np.stack(out))

    def report(name, poses):
        rot_m = trans_m = 0.0
        for i in range(N):
            T_est = np.linalg.inv(np.asarray(poses[0])) @ np.asarray(poses[i])
            T_ref = np.linalg.inv(T_gt[0]) @ T_gt[i]
            r, t = se3.pose_error(jnp.asarray(T_ref), jnp.asarray(T_est))
            rot_m, trans_m = max(rot_m, float(r)), max(trans_m, float(t))
        print(f"{name:>10}: max rot err {rot_m:.4f} rad, max trans err {trans_m:.4f} m")

    for mode in ("EVM", "LSQ"):
        graph = FactorGraph(num_poses=N)
        graph.add(PriorFactor(prior=jnp.asarray(T_gt[0]), weights=jnp.full((6,), 1e6), key=0))
        # gauge: translation of pose 1 fixed lightly to pin scale drift along the plane
        graph.add(PriorFactor(prior=jnp.asarray(T_gt[1]), weights=jnp.full((6,), 1e2), key=1))
        if mode == "EVM":
            for f in plane_feats:
                graph.add(make_evm_factor("plane", f))
            for f in edge_feats:
                graph.add(make_evm_factor("edge", f))
        else:
            for f in plane_feats:
                graph.add(make_lsq_ba_factor(moments(f)))
        res = jax.jit(lambda p: optimize_lm(graph, p, LMParams(max_iterations=25)))(noised())
        report(mode, res.poses)


if __name__ == "__main__":
    main()
