"""Golden tests for the LM optimizers on synthetic problems with known optima
(SURVEY.md §4: 'LM on synthetic BA problems with known optimum')."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_aruco_tpu.config import CameraConfig
from orb_slam2_aruco_tpu.geometry import camera as cam_mod
from orb_slam2_aruco_tpu.geometry import lie
from orb_slam2_aruco_tpu.optim import ba, pose_graph, pose_opt, sim3_opt
from orb_slam2_aruco_tpu.optim.residuals import marker_corner_points_world


CAM = cam_mod.camera_from_config(
    CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0, dist=(0, 0, 0, 0, 0),
                 width=640, height=480)
)


def make_scene(rng, n=200, depth=(4.0, 8.0)):
    xyz = np.stack(
        [rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(*depth, n)],
        axis=-1,
    ).astype(np.float32)
    return jnp.asarray(xyz)


def project_points(Rcw, tcw, xyz):
    p = jnp.einsum("ij,nj->ni", Rcw, xyz) + tcw
    return cam_mod.project(CAM, p)


def test_pose_opt_converges(rng):
    xyz = make_scene(rng)
    R_true = lie.so3_exp(jnp.asarray([0.1, -0.2, 0.05]))
    t_true = jnp.asarray([0.3, -0.1, 0.5])
    uv = project_points(R_true, t_true, xyz)
    # perturbed init
    R0 = lie.so3_exp(jnp.asarray([0.15, -0.1, 0.0]))
    t0 = jnp.asarray([0.0, 0.0, 0.0])
    res = pose_opt.optimize_pose(
        R0, t0, CAM, xyz, uv, jnp.ones(xyz.shape[0]), jnp.ones(xyz.shape[0])
    )
    np.testing.assert_allclose(np.asarray(res.Rcw), np.asarray(R_true), atol=1e-3)
    np.testing.assert_allclose(np.asarray(res.tcw), np.asarray(t_true), atol=1e-2)
    assert int(res.n_inliers) == xyz.shape[0]


def test_pose_opt_rejects_outliers(rng):
    xyz = make_scene(rng)
    R_true = lie.so3_exp(jnp.asarray([0.1, -0.2, 0.05]))
    t_true = jnp.asarray([0.3, -0.1, 0.5])
    uv = project_points(R_true, t_true, xyz)
    n_out = 40
    uv = uv.at[:n_out].add(
        jnp.asarray(rng.uniform(30, 80, size=(n_out, 2)), dtype=jnp.float32)
    )
    res = pose_opt.optimize_pose(
        R_true, t_true, CAM, xyz, uv, jnp.ones(xyz.shape[0]), jnp.ones(xyz.shape[0])
    )
    inl = np.asarray(res.inliers)
    assert inl[:n_out].sum() == 0          # all outliers rejected
    assert inl[n_out:].sum() == xyz.shape[0] - n_out
    np.testing.assert_allclose(np.asarray(res.Rcw), np.asarray(R_true), atol=1e-3)


def test_pose_opt_markers_only(rng):
    # marker-only tracking (TrackByAruco path): 2 markers, 8 corner edges
    Rwm1 = lie.so3_exp(jnp.asarray([0.0, 0.0, 0.3]))
    twm1 = jnp.asarray([0.5, 0.0, 5.0])
    Rwm2 = lie.so3_exp(jnp.asarray([0.2, 0.1, 0.0]))
    twm2 = jnp.asarray([-0.5, 0.3, 6.0])
    corners = jnp.stack([
        marker_corner_points_world(Rwm1, twm1, 0.165),
        marker_corner_points_world(Rwm2, twm2, 0.165),
    ])  # [2, 4, 3]
    R_true = lie.so3_exp(jnp.asarray([0.05, -0.1, 0.02]))
    t_true = jnp.asarray([0.1, 0.05, 0.2])
    uv = project_points(R_true, t_true, corners.reshape(-1, 3)).reshape(2, 4, 2)
    res = pose_opt.optimize_pose(
        jnp.eye(3), jnp.zeros(3), CAM,
        jnp.zeros((8, 3)), jnp.zeros((8, 2)), jnp.zeros(8), jnp.ones(8),
        marker_corners_w=corners, marker_uv=uv, marker_mask=jnp.ones(2),
    )
    np.testing.assert_allclose(np.asarray(res.Rcw), np.asarray(R_true), atol=1e-3)
    np.testing.assert_allclose(np.asarray(res.tcw), np.asarray(t_true), atol=1e-2)


def _make_ba_problem(rng, K=4, L=60, M=2, noise=0.0, perturb=0.05):
    xyz = make_scene(rng, L)
    # cameras on a small arc
    R_true, t_true = [], []
    for k in range(K):
        R_true.append(lie.so3_exp(jnp.asarray([0.02 * k, 0.3 * k / K, 0.0])))
        t_true.append(jnp.asarray([0.4 * k, 0.02 * k, 0.1 * k], dtype=jnp.float32))
    R_true = jnp.stack(R_true)
    t_true = jnp.stack(t_true)
    # markers
    Rwm = jnp.stack([lie.so3_exp(jnp.asarray([0.1, 0.2 * m, 0.0])) for m in range(M)])
    twm = jnp.stack([jnp.asarray([m - 0.5, 0.0, 5.0], dtype=jnp.float32) for m in range(M)])
    side = jnp.full((M,), 0.165, dtype=jnp.float32)

    # point edges: every camera observes every point
    e_kf = jnp.repeat(jnp.arange(K), L)
    e_pt = jnp.tile(jnp.arange(L), K)
    p_cam = jnp.einsum("kij,nj->knI".replace("I", "i"), R_true, xyz) + t_true[:, None]
    e_uv = cam_mod.project(CAM, p_cam).reshape(K * L, 2)
    if noise > 0:
        e_uv = e_uv + jnp.asarray(rng.normal(size=e_uv.shape) * noise, dtype=jnp.float32)
    # marker corner edges: every camera observes every marker corner
    corners_w = jax.vmap(marker_corner_points_world, in_axes=(0, 0, 0))(
        Rwm, twm, side
    )  # [M, 4, 3]
    m_kf = jnp.repeat(jnp.arange(K), M * 4)
    m_marker = jnp.tile(jnp.repeat(jnp.arange(M), 4), K)
    m_corner = jnp.tile(jnp.arange(4), K * M)
    cw_flat = corners_w.reshape(M * 4, 3)
    mc_cam = jnp.einsum("kij,nj->kni", R_true, cw_flat) + t_true[:, None]
    m_uv = cam_mod.project(CAM, mc_cam).reshape(K * M * 4, 2)

    # perturb free states (cams 0 and 1 stay fixed at truth — gauge anchors)
    Rp = [R_true[0], R_true[1]]
    tp = [t_true[0], t_true[1]]
    for k in range(2, K):
        dR, dt = lie.se3_exp(
            jnp.asarray(rng.normal(size=6) * perturb, dtype=jnp.float32)
        )
        Rk, tk = lie.se3_compose(dR, dt, R_true[k], t_true[k])
        Rp.append(Rk)
        tp.append(tk)
    pts0 = xyz + jnp.asarray(rng.normal(size=xyz.shape) * perturb, dtype=jnp.float32)
    Rwm0, twm0 = [], []
    for m in range(M):
        dR, dt = lie.se3_exp(
            jnp.asarray(rng.normal(size=6) * perturb, dtype=jnp.float32)
        )
        Rm, tm = lie.se3_compose(dR, dt, Rwm[m], twm[m])
        Rwm0.append(Rm)
        twm0.append(tm)

    cam_free = jnp.ones(K).at[0].set(0.0).at[1].set(0.0)  # fix 2 cams: full gauge
    prob = ba.BAProblem(
        Rcw=jnp.stack(Rp), tcw=jnp.stack(tp), points=pts0,
        Rwm=jnp.stack(Rwm0), twm=jnp.stack(twm0), marker_side=side,
        e_kf=e_kf, e_pt=e_pt, e_uv=e_uv,
        e_info=jnp.ones(K * L), e_mask=jnp.ones(K * L),
        m_kf=m_kf, m_marker=m_marker, m_corner=m_corner, m_uv=m_uv,
        m_info=jnp.full((K * M * 4,), 25.0), m_mask=jnp.ones(K * M * 4),
        cam_free=cam_free, pt_free=jnp.ones(L), marker_free=jnp.ones(M),
    )
    truth = dict(R=R_true, t=t_true, xyz=xyz, Rwm=Rwm, twm=twm)
    return prob, truth


def test_ba_converges_to_truth(rng):
    prob, truth = _make_ba_problem(rng)
    out = ba.ba_solve(prob, CAM, iters=15)
    np.testing.assert_allclose(np.asarray(out.Rcw), np.asarray(truth["R"]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(out.tcw), np.asarray(truth["t"]), atol=1e-2)
    np.testing.assert_allclose(np.asarray(out.points), np.asarray(truth["xyz"]), atol=2e-2)
    np.testing.assert_allclose(np.asarray(out.twm), np.asarray(truth["twm"]), atol=1e-2)
    assert float(out.chi2) < 1e-2


def test_ba_masked_edges_ignored(rng):
    prob, truth = _make_ba_problem(rng)
    # corrupt half the edges but mask them out -> same result
    E = prob.e_uv.shape[0]
    bad_uv = prob.e_uv.at[: E // 2].add(100.0)
    mask = prob.e_mask.at[: E // 2].set(0.0)
    prob2 = prob._replace(e_uv=bad_uv, e_mask=mask)
    out = ba.ba_solve(prob2, CAM, iters=15)
    np.testing.assert_allclose(np.asarray(out.Rcw), np.asarray(truth["R"]), atol=5e-3)
    np.testing.assert_allclose(np.asarray(out.tcw), np.asarray(truth["t"]), atol=2e-2)


def test_ba_fixed_states_do_not_move(rng):
    prob, _ = _make_ba_problem(rng)
    out = ba.ba_solve(prob, CAM, iters=5)
    np.testing.assert_allclose(np.asarray(out.Rcw[0]), np.asarray(prob.Rcw[0]))
    np.testing.assert_allclose(np.asarray(out.tcw[0]), np.asarray(prob.tcw[0]))


def test_sim3_opt_recovers(rng):
    n = 80
    # points in KF2's camera frame
    p2 = make_scene(rng, n, depth=(3.0, 6.0))
    s_true = jnp.float32(1.3)
    R_true = lie.so3_exp(jnp.asarray([0.1, 0.2, -0.05]))
    t_true = jnp.asarray([0.4, -0.2, 0.3])
    p1 = lie.sim3_apply(s_true[None], R_true, t_true, p2)
    uv1 = cam_mod.project(CAM, p1)
    uv2 = cam_mod.project(CAM, p2)
    res = sim3_opt.optimize_sim3(
        jnp.float32(1.0), jnp.eye(3), jnp.zeros(3) + jnp.asarray([0.3, -0.1, 0.2]),
        p1, p2, uv1, uv2, jnp.ones(n), jnp.ones(n), jnp.ones(n), CAM,
    )
    np.testing.assert_allclose(float(res.s), float(s_true), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(res.R), np.asarray(R_true), atol=1e-3)
    np.testing.assert_allclose(np.asarray(res.t), np.asarray(t_true), atol=1e-2)
    assert int(res.n_inliers) == n


def test_pose_graph_closes_loop(rng):
    # ring of K keyframes with drift; loop edge ties last to first
    K = 12
    # true poses: around a circle
    angles = np.linspace(0, 2 * np.pi, K, endpoint=False)
    R_true, t_true = [], []
    for a in angles:
        R = lie.so3_exp(jnp.asarray([0.0, float(a), 0.0]))
        t = jnp.asarray([np.cos(a), 0.0, np.sin(a)], dtype=jnp.float32)
        # world->cam pose
        R_true.append(R)
        t_true.append(-(R @ t))
    R_true = jnp.stack(R_true)
    t_true = jnp.stack(t_true)
    s_true = jnp.ones(K)

    # measurements: true relative sim3 between consecutive + loop edge
    def rel(i, j):
        # S_m = S_jw * S_wi  (see optimize_pose_graph docstring)
        si, Ri, ti = lie.sim3_inverse(s_true[i], R_true[i], t_true[i])
        return lie.sim3_compose(s_true[j], R_true[j], t_true[j], si, Ri, ti)

    e_i, e_j, ms, mR, mt = [], [], [], [], []
    for k in range(K - 1):
        sm, Rm, tm = rel(k, k + 1)
        e_i.append(k + 1)   # edge residual: log(S_m S_iw S_wj) with i=k+1, j=k
        e_j.append(k)
        # careful: rel(k, k+1) = S_{k+1,w} S_{w,k}: maps k-frame to k+1 frame.
        # residual log(S_m · S_iw · S_wj) = 0 requires S_m = S_jw S_wi with
        # (i, j) as passed -> S_m = rel(i=k+1 -> measured from j=k): S_m =
        # S_jw S_wi = S_{k,w} S_{w,k+1} = rel(k+1, k)
        sm, Rm, tm = rel(k + 1, k)
        ms.append(sm); mR.append(Rm); mt.append(tm)
    # loop edge K-1 <-> 0
    e_i.append(0)
    e_j.append(K - 1)
    sm, Rm, tm = rel(0, K - 1)
    ms.append(sm); mR.append(Rm); mt.append(tm)

    # drifted initialization: accumulate noisy odometry
    s0 = [jnp.float32(1.0)]
    R0 = [R_true[0]]
    t0 = [t_true[0]]
    for k in range(1, K):
        sm_, Rm_, tm_ = rel(k - 1, k)
        # inject drift into the integrated estimate
        dxi = jnp.asarray(rng.normal(size=7) * 0.03, dtype=jnp.float32)
        ds, dR, dt = lie.sim3_exp(dxi)
        sm_n, Rm_n, tm_n = lie.sim3_compose(sm_, Rm_, tm_, ds, dR, dt)
        sk, Rk, tk = lie.sim3_compose(sm_n, Rm_n, tm_n, s0[-1], R0[-1], t0[-1])
        s0.append(sk); R0.append(Rk); t0.append(tk)

    free = jnp.ones(K).at[0].set(0.0)
    out = pose_graph.optimize_pose_graph(
        jnp.stack(s0), jnp.stack(R0), jnp.stack(t0),
        jnp.asarray(e_i, dtype=jnp.int32), jnp.asarray(e_j, dtype=jnp.int32),
        jnp.stack(ms), jnp.stack(mR), jnp.stack(mt),
        jnp.ones(len(ms)), free, iters=30,
    )
    assert float(out.chi2) < 1e-3  # f32 noise floor of chained sim3 exp/log
    # with exact measurements, poses should return to truth
    np.testing.assert_allclose(np.asarray(out.s), np.asarray(s_true), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.R), np.asarray(R_true), atol=5e-3)
    np.testing.assert_allclose(np.asarray(out.t), np.asarray(t_true), atol=2e-2)


def test_ransac_pnp_with_outliers(rng):
    from orb_slam2_aruco_tpu.optim import pnp

    xyz = make_scene(rng, 120)
    R_true = lie.so3_exp(jnp.asarray([0.2, -0.1, 0.15]))
    t_true = jnp.asarray([0.4, -0.3, 0.6])
    uv = project_points(R_true, t_true, xyz)
    uv = uv.at[:30].add(
        jnp.asarray(rng.uniform(25, 60, size=(30, 2)), dtype=jnp.float32)
    )
    res = pnp.ransac_pnp(xyz, uv, jnp.ones(120), CAM)
    assert bool(res.ok)
    inl = np.asarray(res.inliers)
    assert inl[:30].sum() <= 2 and inl[30:].sum() >= 85
    np.testing.assert_allclose(np.asarray(res.Rcw), np.asarray(R_true), atol=5e-3)
    np.testing.assert_allclose(np.asarray(res.tcw), np.asarray(t_true), atol=5e-2)


def test_ba_cg_matches_dense():
    """The matrix-free PCG Schur solve must reach the same optimum as the
    dense Cholesky path on a synthetic BA problem large enough to trip the
    auto-CG threshold (K > 32)."""
    import numpy as np
    from orb_slam2_aruco_tpu.optim import ba as ba_mod

    rng = np.random.default_rng(3)
    K, L = 40, 600
    pts = np.stack([rng.uniform(-2, 2, L), rng.uniform(-1.5, 1.5, L),
                    rng.uniform(4, 8, L)], axis=-1).astype(np.float32)
    Rs, ts, e_kf, e_pt, e_uv = [], [], [], [], []
    for k in range(K):
        ang = 0.02 * rng.normal(size=3)
        from orb_slam2_aruco_tpu.geometry.lie import so3_exp
        R = np.asarray(so3_exp(jnp.asarray(ang, dtype=jnp.float32)))
        t = np.asarray([0.08 * k, 0.0, 0.0], dtype=np.float32)
        Rs.append(R); ts.append(t)
        pc = pts @ R.T + t
        uv = np.stack([CAM.fx * pc[:, 0] / pc[:, 2] + CAM.cx,
                       CAM.fy * pc[:, 1] / pc[:, 2] + CAM.cy], axis=-1)
        sel = rng.permutation(L)[:120]
        e_kf += [k] * len(sel)
        e_pt += sel.tolist()
        e_uv += (uv[sel] + rng.normal(0, 0.3, (len(sel), 2))).tolist()
    E = len(e_kf)
    # noisy initial states
    t_noisy = np.asarray(ts) + rng.normal(0, 0.01, (K, 3)).astype(np.float32)
    t_noisy[0] = ts[0]
    pts_noisy = pts + rng.normal(0, 0.02, pts.shape).astype(np.float32)
    M = 2
    prob = ba_mod.BAProblem(
        Rcw=jnp.asarray(np.asarray(Rs)), tcw=jnp.asarray(t_noisy),
        points=jnp.asarray(pts_noisy),
        Rwm=jnp.broadcast_to(jnp.eye(3), (M, 3, 3)),
        twm=jnp.zeros((M, 3)), marker_side=jnp.full((M,), 0.165),
        e_kf=jnp.asarray(e_kf, jnp.int32), e_pt=jnp.asarray(e_pt, jnp.int32),
        e_uv=jnp.asarray(e_uv, jnp.float32),
        e_info=jnp.ones((E,)), e_mask=jnp.ones((E,)),
        m_kf=jnp.zeros((8,), jnp.int32), m_marker=jnp.zeros((8,), jnp.int32),
        m_corner=jnp.tile(jnp.arange(4), 2), m_uv=jnp.zeros((8, 2)),
        m_info=jnp.ones((8,)), m_mask=jnp.zeros((8,)),
        cam_free=jnp.ones((K,)).at[0].set(0.0),
        pt_free=jnp.ones((L,)),
        marker_free=jnp.zeros((M,)),
    )
    cam = CAM
    out_d = ba_mod.ba_solve(prob, cam, iters=8, solver="dense")
    out_c = ba_mod.ba_solve(prob, cam, iters=8, solver="cg")
    chi0 = float(ba_mod._total_chi2(prob, cam)[0])
    cd = float(out_d.chi2)
    cc = float(out_c.chi2)
    assert cd < 0.1 * chi0
    assert cc < 0.1 * chi0
    # same optimum within a whisker
    assert cc <= 1.2 * cd, (cc, cd, chi0)
    np.testing.assert_allclose(np.asarray(out_c.tcw), np.asarray(out_d.tcw),
                               atol=5e-3)
