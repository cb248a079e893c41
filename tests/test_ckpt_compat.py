"""Reference torch-checkpoint import: MLP forward parity vs a torch oracle."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip('torch')

from anerf_tpu.models.nerf import NeRFConfig, apply_nerf
from anerf_tpu.pose.ckpt_compat import (load_reference_checkpoint,
                                        nerf_state_dict_to_params,
                                        pose_ckpt_to_pose_data)


class TorchNeRFOracle(torch.nn.Module):
    """Minimal torch re-statement of the documented architecture
    (8x256 trunk, skip@4, alpha head, feature+view head) used as a numeric
    oracle for weight import."""

    def __init__(self, dnet_in, views_in, W=64, D=4, skips=(2,)):
        super().__init__()
        self.skips = skips
        layers = [torch.nn.Linear(dnet_in, W)]
        for i in range(D - 1):
            in_dim = W + dnet_in if i in skips else W
            layers.append(torch.nn.Linear(in_dim, W))
        self.pts_linears = torch.nn.ModuleList(layers)
        self.alpha_linear = torch.nn.Linear(W, 1)
        self.feature_linear = torch.nn.Linear(W, W)
        self.views_linears = torch.nn.ModuleList(
            [torch.nn.Linear(views_in + W, W // 2)])
        self.rgb_linear = torch.nn.Linear(W // 2, 3)

    def forward(self, pts, views):
        h = pts
        for i, l in enumerate(self.pts_linears):
            h = torch.relu(l(h))
            if i in self.skips:
                h = torch.cat([pts, h], -1)
        alpha = self.alpha_linear(h)
        feat = self.feature_linear(h)
        hv = torch.relu(self.views_linears[0](torch.cat([feat, views], -1)))
        rgb = self.rgb_linear(hv)
        return torch.cat([rgb, alpha], -1)


def test_mlp_import_forward_parity(rng):
    dnet_in, views_in = 48, 24
    oracle = TorchNeRFOracle(dnet_in, views_in)
    sd = oracle.state_dict()
    params = nerf_state_dict_to_params(sd)

    cfg = NeRFConfig(depth=4, width=64, input_ch=dnet_in, input_ch_bones=0,
                     input_ch_views=views_in, skips=(2,), use_viewdirs=True,
                     use_framecode=False)
    pts = rng.normal(size=(32, dnet_in)).astype(np.float32)
    views = rng.normal(size=(32, views_in)).astype(np.float32)

    with torch.no_grad():
        want = oracle(torch.tensor(pts), torch.tensor(views)).numpy()
    got = np.asarray(apply_nerf(params, cfg, jnp.asarray(pts),
                                jnp.asarray(views), compute_dtype=None))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_full_checkpoint_roundtrip(tmp_path, rng):
    dnet_in, views_in = 48, 24
    oracle = TorchNeRFOracle(dnet_in, views_in)
    ckpt = {
        'global_step': 1234,
        'network_fn_state_dict': oracle.state_dict(),
        'network_fine_state_dict': oracle.state_dict(),
        'embed_state_dict': {
            'cutoff_dist': torch.full((24,), 0.7),
            'tau': torch.tensor(512.0),
        },
    }
    p = str(tmp_path / 'ckpt.tar')
    torch.save(ckpt, p)

    params, extras = load_reference_checkpoint(p)
    assert extras['global_step'] == 1234
    assert np.isclose(extras['tau'], 512.0)
    np.testing.assert_allclose(params['cutoff_dist'], 0.7)
    assert params['fine'] is not None
    assert len(params['coarse']['pts_linears']) == 4


def test_pose_ckpt_to_pose_data(tmp_path, rng):
    from anerf_tpu.skeleton import smpl_rest_pose
    n = 5
    pelvis = rng.normal(size=(n, 3)).astype(np.float32)
    bones = (rng.normal(size=(n, 24, 3)) * 0.3).astype(np.float32)
    ckpt = {'poseopt_layer_state_dict': {
        'pelvis': torch.tensor(pelvis),
        'bones': torch.tensor(bones),
        'rest_pose': torch.tensor(smpl_rest_pose[None] * 0.0025),
    }}
    p = str(tmp_path / 'pose.tar')
    torch.save(ckpt, p)

    kp3d, bones_out, skts, cyls, rest, pelv = pose_ckpt_to_pose_data(p)
    assert kp3d.shape == (n, 24, 3)
    assert skts.shape == (n, 24, 4, 4)
    assert cyls.shape == (n, 5)
    np.testing.assert_allclose(pelv, pelvis, atol=1e-6)
    # root joint = rest root + pelvis
    np.testing.assert_allclose(kp3d[:, 0],
                               rest[0] + pelvis, atol=1e-5)
    # skts invert the FK
    from anerf_tpu.ops.fk import fk
    kp_j, skts_j, _, _ = fk(jnp.asarray(bones_out), jnp.asarray(rest),
                            jnp.asarray(pelvis))
    np.testing.assert_allclose(np.asarray(kp_j), kp3d, atol=1e-4)
    np.testing.assert_allclose(np.asarray(skts_j), skts, atol=1e-4)


def test_export_import_roundtrip(tmp_path, rng):
    """Our params -> reference .tar -> back, numerically identical."""
    import jax
    from anerf_tpu.models.nerf import init_nerf_params
    from anerf_tpu.pose.ckpt_compat import (export_reference_checkpoint,
                                            load_reference_checkpoint)
    cfg = NeRFConfig(depth=4, width=64, input_ch=48, input_ch_bones=0,
                     input_ch_views=24, skips=(2,), use_viewdirs=True,
                     use_framecode=True, framecode_ch=16, n_framecodes=3)
    params = {'coarse': init_nerf_params(jax.random.PRNGKey(2), cfg),
              'fine': init_nerf_params(jax.random.PRNGKey(3), cfg),
              'cutoff_dist': jnp.full((24,), 0.42)}
    pose_params = {'pelvis': rng.normal(size=(5, 3)).astype(np.float32),
                   'bones': rng.normal(size=(5, 24, 3)).astype(np.float32)}
    p = str(tmp_path / 'export.tar')
    export_reference_checkpoint(p, params, global_step=777, tau=300.0,
                                pose_params=pose_params,
                                rest_pose=rng.normal(size=(24, 3)))
    back, extras = load_reference_checkpoint(p)
    assert extras['global_step'] == 777
    assert np.isclose(extras['tau'], 300.0)
    for a, b in zip(jax.tree_util.tree_leaves(params['coarse']),
                    jax.tree_util.tree_leaves(back['coarse'])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    np.testing.assert_allclose(np.asarray(back['cutoff_dist']), 0.42)
    sd = extras['poseopt_state_dict']
    np.testing.assert_allclose(np.asarray(sd['pelvis']),
                               pose_params['pelvis'])
