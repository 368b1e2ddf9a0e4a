import os

import numpy as np
import pytest

from bbtools_tpu.ml import CellNet, parse_bbnet, save_bbnet

REF_NET = "/root/reference/resources/bbmerge.bbnet"


def test_forward_hand_computed():
    # 2-1 net: out = sig(0.5 + 1*x0 - 2*x1)
    net = CellNet(
        dims=[2, 1],
        weights=[np.array([[1.0, -2.0]], np.float32)],
        biases=[np.array([0.5], np.float32)],
        types=[np.array([0], np.int32)],
    )
    out = net.apply(np.array([[1.0, 1.0], [0.0, 0.0]], np.float32))
    want = 1 / (1 + np.exp(-np.array([-0.5, 0.5])))
    np.testing.assert_allclose(out[:, 0], want, rtol=1e-5)


def test_activation_types():
    x = np.array([[0.7]], np.float32)
    for tname, fn in [
        ("TANH", np.tanh),
        ("RSLOG", lambda v: np.sign(v) * np.log(abs(v) + 1)),
        ("SWISH", lambda v: v / (1 + np.exp(-v))),
        ("ESIG", lambda v: 2 / (1 + np.exp(-v)) - 1),
        ("BELL", lambda v: np.exp(-v * v)),
        ("LINEAR", lambda v: v),
    ]:
        from bbtools_tpu.ml.cellnet import TYPES

        net = CellNet(
            dims=[1, 1],
            weights=[np.array([[1.0]], np.float32)],
            biases=[np.array([0.0], np.float32)],
            types=[np.array([TYPES.index(tname)], np.int32)],
        )
        got = float(net.apply(x)[0, 0])
        assert abs(got - fn(0.7)) < 1e-5, (tname, got, fn(0.7))


def test_train_xor():
    net = CellNet.create([2, 8, 1], seed=1, hidden="TANH")
    x = np.array([[0, 0], [0, 1], [1, 0], [1, 1]], np.float32)
    y = np.array([[0], [1], [1], [0]], np.float32)
    loss = net.fit(x, y, epochs=1500, lr=0.05)
    assert loss < 0.02, loss
    pred = net.apply(x)[:, 0]
    assert (pred.round() == y[:, 0]).all(), pred


def test_bbnet_roundtrip(tmp_path):
    net = CellNet.create([3, 5, 2], seed=2)
    net.cutoff = 0.42
    p = str(tmp_path / "x.bbnet")
    save_bbnet(net, p)
    net2 = parse_bbnet(p)
    assert net2.dims == [3, 5, 2]
    assert abs(net2.cutoff - 0.42) < 1e-6
    x = np.random.default_rng(0).normal(size=(4, 3)).astype(np.float32)
    np.testing.assert_allclose(net.apply(x), net2.apply(x), atol=1e-5)


@pytest.mark.skipif(not os.path.exists(REF_NET), reason="no reference data")
def test_parse_reference_bbmerge_net():
    net = parse_bbnet(REF_NET)
    assert net.dims == [23, 96, 40, 56, 9, 1]
    assert abs(net.cutoff - 0.872857) < 1e-5
    x = np.zeros((2, 23), np.float32)
    x[1] = 0.5
    out = net.apply(x)
    assert out.shape == (2, 1)
    assert np.isfinite(out).all()
    assert (out >= -1).all() and (out <= 2).all()
