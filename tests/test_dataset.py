"""Data layer: synthetic h5 fixture -> dataset -> batches."""
import numpy as np
import pytest

from anerf_tpu.data.dataset import BaseH5Dataset, ConcatH5Dataset
from anerf_tpu.data.fixtures import make_synthetic_h5
from anerf_tpu.data.pipeline import (BatchLoader, ImagePermutationSampler,
                                     assemble_batch)
from anerf_tpu.data.surreal import SurrealDataset


@pytest.fixture(scope='module')
def h5_path(tmp_path_factory):
    p = tmp_path_factory.mktemp('data') / 'synthetic_train_h5py.h5'
    make_synthetic_h5(str(p), n_kps=6, n_cams=2, H=48, W=48)
    return str(p)


def test_dataset_meta(h5_path):
    ds = SurrealDataset(h5_path, N_samples=32, split='train')
    assert len(ds) == 12
    meta = ds.get_meta()
    assert meta['kp3d'].shape == (6, 24, 3)  # one row per unique kp
    assert meta['rest_pose'].shape == (24, 3)
    assert meta['n_views'] == 2
    rd = ds.get_render_data()
    assert rd['imgs'].shape[1:] == (48, 48, 3)


def test_get_item_contract(h5_path):
    ds = SurrealDataset(h5_path, N_samples=32, split='train')
    it = ds.get_item(7)
    assert it['rays_o'].shape == (32, 3)
    assert it['rays_d'].shape == (32, 3)
    assert it['target_s'].shape == (32, 3)
    assert it['kp3d'].shape == (1, 24, 3)
    assert it['skts'].shape == (1, 24, 4, 4)
    assert it['cyls'].shape == (1, 5)
    # surreal index arithmetic: image 7 of (2 cams x 6 kps) grid
    assert int(it['kp_idx']) == 7 % 6
    assert int(it['cam_idxs']) == 7 // 6
    assert np.isfinite(it['rays_d']).all()


def test_sampled_pixels_in_mask(h5_path):
    ds = SurrealDataset(h5_path, N_samples=16, split='train')
    ds.init_dataset()
    for q in range(4):
        idxs = ds.sample_pixels(q, q)
        mask = ds.dataset['sampling_masks'][q].reshape(-1)
        assert (mask[idxs] > 0).all()


def test_assemble_batch_contract(h5_path):
    ds = SurrealDataset(h5_path, N_samples=16, split='train')
    sampler = ImagePermutationSampler(len(ds), 4, seed=0)
    batch = assemble_batch(ds, sampler.next_batch())
    assert batch['rays'].shape == (64, 11)
    assert batch['target_s'].shape == (64, 3)
    assert batch['kp_idxs'].shape == (4,)
    assert batch['kp3d'].shape == (4, 24, 3)
    assert batch['pose_idx'].shape == (64,)
    assert batch['pose_idx'].max() == 3
    # viewdirs are normalized rays_d
    vd = batch['rays'][:, 8:11]
    np.testing.assert_allclose(np.linalg.norm(vd, axis=-1), 1.0, atol=1e-5)


def test_sampler_covers_all_images():
    s = ImagePermutationSampler(10, 4, seed=1)
    seen = []
    for _ in range(5):
        seen.extend(s.next_batch().tolist())
    # after 2 epochs worth of draws every image appeared
    assert set(seen) == set(range(10))


def test_batch_loader_prefetch(h5_path):
    ds = SurrealDataset(h5_path, N_samples=16, split='train')
    loader = BatchLoader(ds, n_images=4, prefetch=2, seed=0).start()
    try:
        b1 = loader.next()
        b2 = loader.next()
        assert b1['rays'].shape == b2['rays'].shape == (64, 11)
    finally:
        loader.stop()


def test_concat_dataset(h5_path, tmp_path):
    p2 = str(tmp_path / 'second_train_h5py.h5')
    make_synthetic_h5(p2, n_kps=4, n_cams=2, H=48, W=48, seed=3)
    d1 = SurrealDataset(h5_path, N_samples=8, split='train')
    d2 = SurrealDataset(p2, N_samples=8, split='train')
    cat = ConcatH5Dataset([d1, d2])
    assert len(cat) == len(d1) + len(d2)
    it = cat.get_item(len(d1) + 1)
    assert int(it['subject_idxs']) == 1
    assert int(it['kp_idx']) >= len(d1.kp3d)
    meta = cat.get_meta()
    assert meta['n_subjects'] == 2
    assert meta['rest_pose'].shape == (2, 24, 3)
    assert meta['rest_pose_idxs'].shape == (len(d1.kp3d) + len(d2.kp3d),)


def test_3dhp_dataset_splits(h5_path):
    """3DHP loader: ::9 val split, temporal validity, per-subject fixes
    (reference load_3dhp.py:143-215)."""
    from anerf_tpu.data.mpi3dhp import ThreeDHPDataset

    n_imgs = 12
    full = ThreeDHPDataset(h5_path, N_samples=16, split='full',
                           subject='S1')
    train = ThreeDHPDataset(h5_path, N_samples=16, split='train',
                            subject='S1')
    val = ThreeDHPDataset(h5_path, N_samples=16, split='val', subject='S1')
    assert len(train) == n_imgs
    assert len(val) == len(np.arange(n_imgs)[::9])
    assert train.temp_validity[0] == 0 and train.temp_validity[1:].all()

    item = train.get_item(3)
    assert item['rays_o'].shape == (16, 3)
    assert np.isfinite(item['target_s']).all()

    # S2: backgrounds forced to zero (load_3dhp.py:153)
    s2 = ThreeDHPDataset(h5_path, N_samples=16, split='train', subject='S2')
    assert (s2.bgs == 0).all() and not (full.bgs == 0).all()

    # S5/S6: camera translation divided by 0.82 (load_3dhp.py:155-159)
    s5 = ThreeDHPDataset(h5_path, N_samples=16, split='train', subject='S5')
    np.testing.assert_allclose(s5.c2ws[..., :3, -1] * 0.82,
                               full.c2ws[..., :3, -1], rtol=1e-6)


def test_bkgd_segmenter_recovers_person_mask(tmp_path):
    """Zero-download background-subtraction segmenter: on the synthetic
    fixture (person blobs on a white plate) the recovered mask must
    overlap the GT mask with high IoU."""
    from anerf_tpu.data.fixtures import make_synthetic_h5
    from anerf_tpu.data.process_mask import get_segmenter, process_masks

    data = make_synthetic_h5(str(tmp_path / 's.h5'), n_kps=2, n_cams=1,
                             H=48, W=48)
    bkgd = data['bkgds'][0]
    seg = get_segmenter('bkgd', bkgd=bkgd, min_component=8)
    masks, sampling = process_masks(data['imgs'], seg)
    assert masks.shape == data['masks'].shape
    inter = (masks & data['masks']).sum()
    union = (masks | data['masks']).sum()
    assert inter / union > 0.5, f'IoU {inter / union:.2f}'
    # sampling masks are dilated supersets
    assert (sampling >= masks).all()


def test_torch_segmenter_stub_model_e2e(tmp_path):
    """Model-segmenter branch (reference DeepLabModel + process_bbox_masks,
    core/process_mask.py:83-226): inject a stub torchvision-contract model
    ({'out': (1, C, H, W) logits}) so the normalize -> infer -> argmax ->
    bbox-crop -> dilate path runs without downloaded weights."""
    import torch

    from anerf_tpu.data.fixtures import make_synthetic_h5
    from anerf_tpu.data.process_mask import get_segmenter, process_masks

    data = make_synthetic_h5(str(tmp_path / 's.h5'), n_kps=2, n_cams=1,
                             H=48, W=48)

    mean = torch.tensor([0.485, 0.456, 0.406]).view(3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(3, 1, 1)

    class StubDeepLab:
        """Emits person logits wherever the pixel differs from the white
        plate — undoing the ImageNet normalization make_torch_segmenter
        applies, so the wrapping math is what's under test."""
        def __call__(self, x):
            img = x[0] * std + mean          # back to 0..1
            fg = (img - 1.0).abs().max(0).values > 0.1
            logits = torch.zeros((1, 21) + fg.shape)
            logits[0, 15][fg] = 10.0
            return {'out': logits}

    seg = get_segmenter('torchvision', model=StubDeepLab())

    # full-image inference
    masks, sampling = process_masks(data['imgs'], seg)
    inter = (masks & data['masks']).sum()
    union = (masks | data['masks']).sum()
    assert inter / union > 0.5, f'IoU {inter / union:.2f}'
    assert (sampling >= masks).all()

    # bbox-cropped inference (process_bbox_masks analog): outside-box
    # pixels must stay background even though the stub marks them fg
    n = len(data['imgs'])
    bboxes = np.tile(np.array([8, 4, 40, 46], np.int64), (n, 1))
    masks_b, _ = process_masks(data['imgs'], seg, bboxes=bboxes)
    assert masks_b[:, :4].sum() == 0 and masks_b[:, 46:].sum() == 0
    assert masks_b[:, :, :8].sum() == 0 and masks_b[:, :, 40:].sum() == 0
    inside = masks_b[0, 4:46, 8:40, 0]
    gt_inside = data['masks'][0, 4:46, 8:40, 0]
    inter = (inside & gt_inside).sum()
    union = (inside | gt_inside).sum()
    assert inter / union > 0.5

    # kind='torchvision' without a model and without torchvision raises
    try:
        import torchvision  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError):
            get_segmenter('torchvision')


def test_torch_segmenter_multi_person_bbox_isolates_subject():
    """Multi-person frame through the model-segmenter branch (VERDICT r3
    #5c): the model marks TWO people; the bbox path (the reference's
    process_bbox_masks subject-isolation mechanism, core/process_mask.py:
    131-226) must keep only the in-box person, while full-image
    inference keeps both."""
    import torch

    from anerf_tpu.data.process_mask import get_segmenter, process_masks

    H = W = 64
    img = np.full((H, W, 3), 255, np.uint8)
    img[10:30, 8:24] = [200, 30, 30]     # subject
    img[40:60, 44:60] = [30, 30, 200]    # second person

    mean = torch.tensor([0.485, 0.456, 0.406]).view(3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(3, 1, 1)

    class TwoPersonStub:
        def __call__(self, x):
            rgb = x[0] * std + mean
            fg = (rgb - 1.0).abs().max(0).values > 0.1
            logits = torch.zeros((1, 21) + fg.shape)
            logits[0, 15][fg] = 10.0
            return {'out': logits}

    seg = get_segmenter('torchvision', model=TwoPersonStub())

    full, _ = process_masks([img], seg)
    assert full[0, 10:30, 8:24].sum() > 0
    assert full[0, 40:60, 44:60].sum() > 0     # both people present

    boxed, sampling = process_masks([img], seg,
                                    bboxes=np.array([[4, 6, 28, 34]]))
    assert boxed[0, 10:30, 8:24].sum() > 0     # subject kept
    assert boxed[0, 40:60, 44:60].sum() == 0   # intruder excluded
    assert (sampling >= boxed).all()


def test_batchloader_prestacked_superbatches(h5_path):
    """BatchLoader(stack=K) emits worker-stacked (K, ...) super-batches
    with the sampler's once-per-epoch coverage preserved."""
    from anerf_tpu.data.pipeline import BatchLoader
    from anerf_tpu.data.surreal import SurrealDataset
    from anerf_tpu.train.trainer import stack_batches

    ds = SurrealDataset(h5_path, N_samples=8, split='train')
    loader = BatchLoader(ds, n_images=2, prefetch=2, num_workers=1,
                         stack=3, stack_fn=stack_batches)
    b = loader.next()            # synchronous path
    assert b['rays'].shape[0] == 3
    assert b['rays'].shape[1] == 2 * 8
    assert b['kp_idxs'].shape == (3, 2)
    loader.start()
    b2 = loader.next()           # threaded path
    assert b2['rays'].shape == b['rays'].shape
    loader.stop()


def test_limbs_fixture_loads(tmp_path):
    """The harder 'limbs' fixture (capsule limbs, textured background)
    writes a valid dataset and loads through the standard pipeline."""
    from anerf_tpu.data.fixtures import make_synthetic_h5
    from anerf_tpu.data.surreal import SurrealDataset

    p = str(tmp_path / 'limbs.h5')
    d = make_synthetic_h5(p, n_kps=4, n_cams=2, H=48, W=48, style='limbs')
    assert 0.01 < d['masks'].mean() < 0.5          # thin but present
    bg = d['bkgds'][0].astype(np.float32) / 255.0
    assert bg.std() > 0.05                          # textured, not flat
    ds = SurrealDataset(p, N_samples=16, split='train')
    item = ds.get_item(0)
    assert item['rays_o'].shape == (16, 3)
    assert item['bgs'].shape == (16, 3)


def test_clutter_fixture_loads(tmp_path):
    """The third adversarial fixture family (VERDICT r2 #1): striped
    limbs + rigid off-body clutter + high-frequency background. Checks
    the clutter is actually off-skeleton but inside the default cutoff
    window, and pose-consistent across frames."""
    from anerf_tpu.data.fixtures import make_synthetic_h5
    from anerf_tpu.data.surreal import SurrealDataset

    p = str(tmp_path / 'clutter.h5')
    d = make_synthetic_h5(p, n_kps=4, n_cams=2, H=96, W=96, style='clutter')
    assert 0.02 < d['masks'].mean() < 0.5
    bg = d['bkgds'][0].astype(np.float32) / 255.0
    assert bg.std() > 0.1                        # high-frequency plate
    # high-frequency content: adjacent-pixel gradient energy well above
    # the smooth 'blobs' fixture's
    img = d['imgs'][0].astype(np.float32) / 255.0
    grad = np.abs(np.diff(img, axis=0)).mean()
    assert grad > 0.05
    ds = SurrealDataset(p, N_samples=16, split='train')
    item = ds.get_item(0)
    assert item['rays_o'].shape == (16, 3)


def test_super_batch_matches_per_item(h5_path):
    """assemble_super_batch (one GIL-free C++ call per dispatch) is
    bit-compatible with the per-item native path: identical seed stream,
    identical sampling/gather logic, so every stacked leaf matches the
    legacy stack_fn output (viewdirs to 1-ulp float tolerance)."""
    from anerf_tpu.data.pipeline import assemble_super_batch
    from anerf_tpu.train.trainer import stack_batches

    K, I, S = 3, 4, 16
    ds_a = SurrealDataset(h5_path, N_samples=S, split='train', seed=7)
    ds_b = SurrealDataset(h5_path, N_samples=S, split='train', seed=7)
    ops = ds_b.super_operands()
    assert ops is not None, 'native super assembler unavailable'

    sampler = ImagePermutationSampler(len(ds_a), I, seed=0)
    idx_lists = [sampler.next_batch() for _ in range(K)]

    legacy = stack_batches([assemble_batch(ds_a, i) for i in idx_lists])
    got = assemble_super_batch(ds_b, idx_lists, ops)

    assert set(got) == set(legacy)
    for k in got:
        a, b = np.asarray(legacy[k]), np.asarray(got[k])
        assert a.shape == b.shape, k
        assert a.dtype == b.dtype, k
        if k == 'rays':
            # cols 0:8 exact; viewdirs (8:11) normalize in C vs numpy
            np.testing.assert_array_equal(a[..., :8], b[..., :8])
            np.testing.assert_allclose(a[..., 8:], b[..., 8:],
                                       rtol=2e-7, atol=2e-7)
        else:
            np.testing.assert_array_equal(a, b, err_msg=k)


def test_loader_uses_super_path(h5_path):
    """BatchLoader routes through the native super assembler and the
    contract matches the stacked legacy layout."""
    ds = SurrealDataset(h5_path, N_samples=8, split='train', seed=3)
    loader = BatchLoader(ds, n_images=2, prefetch=2, num_workers=1,
                         stack=4, stack_fn=None)
    assert loader._super_ops is not None
    b = loader._make()
    assert b['rays'].shape == (4, 16, 11)
    assert b['kp3d'].shape == (4, 2, 24, 3)
    assert b['pose_idx'].shape == (4, 16)
    # unstacked (stack=1) squeezes the leading axis
    loader1 = BatchLoader(ds, n_images=2, prefetch=2, num_workers=1,
                          stack=1)
    b1 = loader1._make()
    assert b1['rays'].shape == (16, 11)
