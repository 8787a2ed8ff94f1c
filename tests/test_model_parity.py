"""Numerical parity of the flax MICA network vs the reference torch model.

Builds the reference torch module (imported from /root/reference — used as a
test oracle only), converts its randomly initialized weights with
mica_tpu.models.convert, and compares forward outputs.
"""

import sys

import numpy as np
import pytest

from pathlib import Path

pytestmark = pytest.mark.skipif(
    not Path("/root/reference/models/model.py").exists(),
    reason="reference snapshot not available",
)

sys.path.insert(0, "/root/reference")

torch = pytest.importorskip("torch")

from mica_tpu.models import convert  # noqa: E402
from mica_tpu.models.mica import MICA  # noqa: E402


@pytest.fixture(scope="module")
def torch_model():
    from models.model import MICA as TorchMICA

    torch.manual_seed(0)
    m = TorchMICA(base_filters=64)
    m.eval()
    return m


@pytest.fixture(scope="module")
def flax_params(torch_model):
    return convert.torch_state_dict_to_params(torch_model.state_dict())


def _forward_torch(torch_model, x, af):
    with torch.no_grad():
        bb, ca, aa = torch_model(torch.from_numpy(x), torch.from_numpy(af))
    return [t.numpy() for t in (bb, ca, aa)]


def _forward_flax(flax_params, x, af):
    # NCDHW -> NDHWC
    xj = np.transpose(x, (0, 2, 3, 4, 1))
    afj = np.transpose(af, (0, 2, 3, 4, 1))
    outs = MICA(base=64).apply({"params": flax_params}, xj, afj)
    return [np.transpose(np.asarray(o), (0, 4, 1, 2, 3)) for o in outs]


@pytest.mark.parametrize("af_mode", ["zeros", "random"])
def test_forward_parity(torch_model, flax_params, af_mode, rng):
    n, d = 2, 8
    x = rng.normal(size=(n, 1, d, d, d)).astype(np.float32)
    if af_mode == "zeros":
        af = np.zeros((n, 24, d, d, d), dtype=np.float32)
    else:
        af = (rng.random(size=(n, 24, d, d, d)) < 0.02).astype(np.float32)

    ref = _forward_torch(torch_model, x, af)
    mine = _forward_flax(flax_params, x, af)

    for name, r, m in zip(("bb", "ca", "aa"), ref, mine):
        assert r.shape == m.shape, name
        np.testing.assert_allclose(m, r, atol=2e-4, rtol=1e-3, err_msg=name)


def test_state_dict_roundtrip(torch_model, flax_params):
    sd = convert.params_to_torch_state_dict(flax_params)
    orig = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    for k, v in sd.items():
        np.testing.assert_array_equal(v, orig[k], err_msg=k)
