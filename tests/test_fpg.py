"""FPG neck (configs/fpg): grid structure, skip staircase, and both
detector integrations."""
import numpy as np
import jax
import jax.numpy as jnp

from iif_tpu.detection.necks import FPG


def _inputs(h=64, w=96, cs=(64, 128, 256, 512)):
    rng = np.random.RandomState(0)
    return [jnp.asarray(rng.randn(1, h // s, w // s, c), jnp.float32)
            for s, c in zip((4, 8, 16, 32), cs)]


def test_fpg_shapes_and_staircase():
    neck = FPG(out_channels=32, stack_times=9)
    xs = _inputs()
    v = jax.jit(neck.init)(jax.random.PRNGKey(0), xs)
    outs = neck.apply(v, xs)
    assert [o.shape[1:3] for o in outs] == [(16, 24), (8, 12), (4, 6),
                                            (2, 3), (1, 2)]
    p = v["params"]
    # skip_inds staircase: level 0 joins only at pathway 4, level 4 at 0
    assert "s0_l0_lat_conv" not in p and "s4_l0_lat_conv" in p
    assert "s0_l4_lat_conv" in p
    # across-skip transitions connect back to the lateral feats
    assert "s4_l0_skip_conv" in p
    # top level has no across-down, bottom level no same-up
    assert "s0_l4_down_conv" not in p and "s4_l0_same_up_conv" not in p


def test_fpg_retinanet_levels():
    """start_level=1 + conv extras -> P3-P7 grids matching the anchor
    shapes (strides 8..128)."""
    from iif_tpu.detection.single_stage import RetinaNet, ss_fpn_shapes

    model = RetinaNet(num_classes=3, depth=18, frozen_stages=-1,
                      neck_type="fpg")
    img = jnp.zeros((1, 64, 96, 3), jnp.float32)
    v = jax.jit(model.init, static_argnums=2)(
        jax.random.PRNGKey(0), img, False)
    feats = model.apply(v, img, False, method=RetinaNet.extract_feat)
    assert [f.shape[1:3] for f in feats] == ss_fpn_shapes((64, 96))


def test_fpg_maskrcnn_forward():
    from iif_tpu.detection.detector import MaskRCNN

    model = MaskRCNN(num_classes=3, depth=18, frozen_stages=-1,
                     neck_type="fpg", with_mask=False)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = jax.jit(model.init, static_argnums=2)(
        jax.random.PRNGKey(0), img, False)
    feats = model.apply(v, img, False, method=MaskRCNN.extract_feat)
    assert len(feats) == 5 and feats[0].shape[1:3] == (16, 16)
