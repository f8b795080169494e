"""Camera math: core/camera + the mytools.vis_3d drop-in module.

Pins the reference conventions (ref mytools/vis_3d.py:4-27):
``world2pixel`` rows are [u, v, z(depth)]; ``pixel2world`` staging returns
(rays, camera-space, world-space) and the evaluators consume ``[-1]``.
"""

import numpy as np

from das_tpu.core import camera


def _cam():
    rng = np.random.RandomState(3)
    K = np.array([[1100.0, 0.0, 512.0],
                  [0.0, 1080.0, 384.0],
                  [0.0, 0.0, 1.0]])
    th = 0.25
    R = np.array([[np.cos(th), -np.sin(th), 0.0],
                  [np.sin(th), np.cos(th), 0.0],
                  [0.0, 0.0, 1.0]])
    t = rng.randn(3, 1)
    return K, R, t


def test_world_pixel_roundtrip():
    K, R, t = _cam()
    rng = np.random.RandomState(0)
    X = rng.randn(3, 16)
    X[2] = np.abs(X[2]) + 4.0  # in front of the camera
    x = camera.world2pixel(X.copy(), K, R, t)
    # world2pixel keeps depth in row 2 (the +1e-5 in the projective divide
    # is the reference's, so the roundtrip is approximate at ~1e-4)
    back = camera.pixel2world(x.copy(), K, R, t)
    assert np.allclose(back, X, atol=1e-3)


def test_vis_3d_module_staging():
    from mytools.vis_3d import pixel2world, world2pixel
    K, R, t = _cam()
    rng = np.random.RandomState(1)
    x = np.abs(rng.randn(3, 12)) * np.array([[400.0], [300.0], [3.0]]) \
        + np.array([[64.0], [64.0], [2.0]])
    x1, x2, x3 = pixel2world(x.copy(), K, R, t)
    # staging: camera-space = rays * depth (x, y rows); depth unchanged
    assert np.allclose(x2[:2], x1[:2] * x1[2], atol=1e-9)
    assert np.allclose(x2[2], x1[2], atol=1e-9)
    # world stage matches core/camera and inverts the extrinsics
    assert np.allclose(x3, camera.pixel2world(x.copy(), K, R, t), atol=1e-9)
    assert np.allclose(R @ x3 + t.reshape(3, 1), x2, atol=1e-9)
    # re-projection closes the loop
    assert np.allclose(world2pixel(x3.copy(), K, R, t)[:2], x[:2], atol=1e-3)
    assert np.allclose(world2pixel(x3.copy(), K, R, t)[2], x[2], atol=1e-9)
