"""Independent-oracle tier (SURVEY.md §5.1): torch CPU cross-checks.

The intra-JAX parity tests (Pallas vs lax) share XLA; torch is a fully
independent implementation of conv3d/BN semantics, catching any systematic
misunderstanding of convolution/padding/normalization conventions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from fastvideotagging_tpu.models.layers import BatchNorm, Conv3D  # noqa: E402

# On TPU, f32 convs use bf16 multiplies by design (the production compute
# path); the oracle check is semantic (padding/stride/stat conventions), so
# tolerances widen to bf16 level there.
_TPU = jax.default_backend() == "tpu"
RTOL = 3e-2 if _TPU else 1e-4
ATOL = 3e-2 if _TPU else 1e-4


def _to_torch_nchw(x_nthwc):
    return torch.from_numpy(np.asarray(x_nthwc)).permute(0, 4, 1, 2, 3)


class TestConv3DAgainstTorch:
    @pytest.mark.parametrize("kernel,stride", [
        ((3, 3, 3), (1, 1, 1)),
        ((3, 3, 3), (2, 2, 2)),
        ((1, 7, 7), (1, 2, 2)),
        ((5, 1, 1), (4, 1, 1)),
    ])
    def test_symmetric_padding_conv(self, kernel, stride):
        """Default padding is torch-exact: Conv3D == torch conv3d(pad=k//2),
        including for strided convs (where XLA 'SAME' would shift by one)."""
        cin, cout = 6, 8
        x = np.random.default_rng(0).normal(size=(2, 8, 12, 12, cin)
                                            ).astype(np.float32)
        module = Conv3D(cout, kernel, strides=stride, dtype=jnp.float32)
        variables = jax.jit(module.init)(jax.random.PRNGKey(0), jnp.asarray(x))
        ours = np.asarray(jax.jit(module.apply)(variables, jnp.asarray(x)))

        w = np.asarray(variables["params"]["kernel"])  # (kt,kh,kw,cin,cout)
        wt = torch.from_numpy(w).permute(4, 3, 0, 1, 2)  # (cout,cin,kt,kh,kw)
        xt = _to_torch_nchw(x)
        theirs = torch.nn.functional.conv3d(
            xt, wt, stride=stride, padding=tuple(k // 2 for k in kernel))
        theirs = theirs.permute(0, 2, 3, 4, 1).numpy()
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(ours, theirs, rtol=RTOL, atol=ATOL)


class TestBatchNormAgainstTorch:
    def test_train_mode_stats(self):
        c = 5
        x = np.random.default_rng(1).normal(size=(4, 3, 6, 6, c)
                                            ).astype(np.float32) * 3 + 1
        module = BatchNorm(use_running_average=False, momentum=0.9,
                           dtype=jnp.float32)
        variables = jax.jit(
            lambda x: module.init(jax.random.PRNGKey(0), x))(jnp.asarray(x))
        ours, _ = module.apply(variables, jnp.asarray(x),
                               mutable=["batch_stats"])

        bn = torch.nn.BatchNorm3d(c, momentum=0.1, eps=1e-5)
        bn.train()
        theirs = bn(_to_torch_nchw(x)).detach().permute(0, 2, 3, 4, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs,
                                   rtol=max(RTOL, 1e-3), atol=ATOL)

    def test_r2plus1d_block_matches_torch_composition(self):
        """Factorized conv pair: ours vs a torch spatial+temporal composition."""
        from fastvideotagging_tpu.models.r2plus1d import Conv2Plus1D

        cin, mid, cout = 4, 6, 8
        x = np.random.default_rng(2).normal(size=(1, 4, 8, 8, cin)
                                            ).astype(np.float32)
        module = Conv2Plus1D(cout, mid, dtype=jnp.float32)
        variables = jax.jit(
            lambda x: module.init(jax.random.PRNGKey(0), x, train=False)
        )(jnp.asarray(x))
        # train=True so BN uses batch statistics (matching the torch calc)
        ours = np.asarray(module.apply(variables, jnp.asarray(x), True,
                                       mutable=["batch_stats"])[0])

        p = variables["params"]
        w_sp = torch.from_numpy(np.asarray(p["spatial"]["kernel"])
                                ).permute(4, 3, 0, 1, 2)
        w_tmp = torch.from_numpy(np.asarray(p["temporal"]["kernel"])
                                 ).permute(4, 3, 0, 1, 2)
        bn_scale = torch.from_numpy(np.asarray(p["bn_mid"]["BatchNorm_0"]["scale"]))
        bn_bias = torch.from_numpy(np.asarray(p["bn_mid"]["BatchNorm_0"]["bias"]))

        xt = _to_torch_nchw(x)
        y = torch.nn.functional.conv3d(xt, w_sp, padding=(0, 1, 1))
        mean = y.mean(dim=(0, 2, 3, 4), keepdim=True)
        var = y.var(dim=(0, 2, 3, 4), unbiased=False, keepdim=True)
        y = (y - mean) / torch.sqrt(var + 1e-5)
        y = y * bn_scale.view(1, -1, 1, 1, 1) + bn_bias.view(1, -1, 1, 1, 1)
        y = torch.relu(y)
        y = torch.nn.functional.conv3d(y, w_tmp, padding=(1, 0, 0))
        theirs = y.permute(0, 2, 3, 4, 1).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=max(RTOL, 1e-3), atol=ATOL)
