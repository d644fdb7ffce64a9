"""Pooling-layer parity vs the reference's exact torch modules."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from peppa_tpu.models.layers import AttentionPool, AveragePool, LastStep  # noqa: E402


@pytest.mark.parametrize("t,d,size", [(13, 28, 28), (7, 512, 512), (30, 28, 28)])
def test_average_pool_matches_adaptive_avg_pool2d(rng, t, d, size):
    """Reference pig/models.py:45-51: AdaptiveAvgPool2d((size, 1)).squeeze(2)."""
    x = rng.normal(size=(3, t, d)).astype(np.float32)
    want = torch.nn.AdaptiveAvgPool2d((size, 1))(
        torch.tensor(x)).squeeze(dim=2).numpy()
    pool = AveragePool(size=size)
    got = pool.apply({}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_attention_pool_matches_reference_module(rng):
    """Reference pig/models.py:30-43: softmax(out(tanh(hidden(x)))) over time."""
    b, t, d, h = 2, 9, 16, 8
    x = rng.normal(size=(b, t, d)).astype(np.float32)

    class TorchAttention(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.hidden = torch.nn.Linear(d, h)
            self.out = torch.nn.Linear(h, d)
            self.softmax = torch.nn.Softmax(dim=1)

        def forward(self, input):
            alpha = self.softmax(self.out(torch.tanh(self.hidden(input))))
            return (alpha * input).sum(dim=1)

    tm = TorchAttention().eval()
    with torch.no_grad():
        want = tm(torch.tensor(x)).numpy()
    params = {
        "hidden": {"kernel": tm.hidden.weight.detach().numpy().T,
                   "bias": tm.hidden.bias.detach().numpy()},
        "out": {"kernel": tm.out.weight.detach().numpy().T,
                "bias": tm.out.bias.detach().numpy()},
    }
    got = AttentionPool(h).apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_last_step(rng):
    x = rng.normal(size=(2, 5, 4)).astype(np.float32)
    got = LastStep().apply({}, jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(got), x[:, -1, :])
