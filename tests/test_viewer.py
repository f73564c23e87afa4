"""Interactive viewer: snapshot math + HTTP surface (viz/viewer.py).

Replaces manual Pangolin-window inspection (reference src/Viewer.cc) with
assertable checks: world snapshot contents, frustum/marker geometry, the
menu-toggle control round trip, and the PNG frame endpoint.
"""

import json
import urllib.request

import numpy as np
import jax.numpy as jnp

from orb_slam2_aruco_tpu.config import SlamConfig
from orb_slam2_aruco_tpu.viz import viewer as vz
from orb_slam2_aruco_tpu.worldmap.state import empty_map


def _tiny_map():
    cfg = SlamConfig()
    m = empty_map(cfg)
    K, L = m.K, m.L
    kf_valid = np.zeros(K, bool)
    kf_valid[:3] = True
    tcw = np.zeros((K, 3), np.float32)
    tcw[1] = [0.5, 0, 0]
    tcw[2] = [1.0, 0, 0]
    pt_valid = np.zeros(L, bool)
    pt_valid[:40] = True
    xyz = np.zeros((L, 3), np.float32)
    xyz[:40] = np.random.default_rng(0).normal(size=(40, 3))
    # KFs 0 and 1 share 20 points (covis weight 20 >= 15); KF2 shares none
    obs = np.zeros((L, K), bool)
    obs[:20, 0] = obs[:20, 1] = True
    obs[20:40, 2] = True
    mk_valid = np.zeros(m.M, bool)
    mk_valid[0] = True
    mk_id = np.asarray(m.mk_id).copy()
    mk_id[0] = 17
    mk_side = np.asarray(m.mk_side).copy()
    mk_side[0] = 0.2
    mk_twm = np.zeros((m.M, 3), np.float32)
    mk_twm[0] = [0, 0, 2.0]
    return m._replace(
        kf_valid=jnp.asarray(kf_valid), kf_tcw=jnp.asarray(tcw),
        pt_valid=jnp.asarray(pt_valid), pt_xyz=jnp.asarray(xyz),
        pt_obs_kf=jnp.asarray(obs), mk_valid=jnp.asarray(mk_valid),
        mk_id=jnp.asarray(mk_id), mk_side=jnp.asarray(mk_side),
        mk_twm=jnp.asarray(mk_twm),
    )


def test_snapshot_map_contents():
    snap = vz.snapshot_map(_tiny_map())
    assert len(snap["points"]) == 40
    assert len(snap["kf_centers"]) == 3
    # identity rotations => center == -tcw
    assert np.allclose(snap["kf_centers"][1], [-0.5, 0, 0], atol=1e-4)
    # exactly the (0,1) covisibility edge (weight 20), not (0,2)/(1,2)
    assert snap["covis_edges"] == [[0, 1]]
    (mk,) = snap["markers"]
    assert mk["id"] == 17
    quad = np.asarray(mk["quad"])
    assert quad.shape == (4, 3)
    # side length 0.2 around center (0,0,2), reference corner order
    # c0=(-s/2,+s/2), c1=(+s/2,+s/2) (MapAruco.cc:30-37)
    assert np.allclose(quad[0], [-0.1, 0.1, 2.0], atol=1e-4)
    assert np.allclose(np.linalg.norm(quad[1] - quad[0]), 0.2, atol=1e-4)


def test_viewer_http_roundtrip():
    v = vz.MapViewer(port=0)
    try:
        frame = np.zeros((24, 32, 3), np.uint8)
        frame[4:8, 4:8] = 255
        Rcw = np.eye(3, dtype=np.float32)
        tcw = np.asarray([0.0, 0.0, -3.0], np.float32)
        v.update(map_state=_tiny_map(), frame_rgb=frame,
                 cam_Rcw=Rcw, cam_tcw=tcw, status="state: OK")

        base = f"http://127.0.0.1:{v.port}"
        html = urllib.request.urlopen(base + "/", timeout=5).read()
        assert b"Show Aruco" in html and b"Localization Mode" in html

        st = json.loads(
            urllib.request.urlopen(base + "/state", timeout=5).read()
        )
        assert st["status"] == "state: OK"
        assert len(st["map"]["points"]) == 40
        assert st["cam"]["c"] == [0.0, 0.0, 3.0]  # -Rwc@tcw

        png = urllib.request.urlopen(base + "/frame.png", timeout=5).read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"

        # menu toggle -> poll_controls (Viewer->Tracking flag protocol)
        req = urllib.request.Request(
            base + "/control",
            data=json.dumps({"cmd": "localization", "value": True}).encode(),
            method="POST",
        )
        urllib.request.urlopen(req, timeout=5)
        ctrl = v.poll_controls()
        assert ctrl == {"localization": True}
        assert v.poll_controls() == {}  # one-shot drain
    finally:
        v.close()


def test_viewer_rejects_cross_origin_control():
    """POST /control with a foreign Origin header must be rejected (a JSON
    'simple request' from any open webpage could otherwise reset the live
    system); same-origin and origin-less (CLI) requests still work."""
    import json
    import urllib.request
    import urllib.error

    from orb_slam2_aruco_tpu.viz.viewer import MapViewer

    v = MapViewer(port=0)
    try:
        base = f"http://127.0.0.1:{v.port}"
        evil = urllib.request.Request(
            base + "/control",
            data=json.dumps({"cmd": "reset", "value": True}).encode(),
            headers={"Origin": "http://evil.example"},
            method="POST",
        )
        try:
            urllib.request.urlopen(evil, timeout=5)
            raise AssertionError("cross-origin /control was accepted")
        except urllib.error.HTTPError as e:
            assert e.code == 403
        assert v.poll_controls() == {}
        ok = urllib.request.Request(
            base + "/control",
            data=json.dumps({"cmd": "reset", "value": True}).encode(),
            headers={"Origin": f"http://127.0.0.1:{v.port}"},
            method="POST",
        )
        urllib.request.urlopen(ok, timeout=5)
        assert v.poll_controls() == {"reset": True}
    finally:
        v.close()
