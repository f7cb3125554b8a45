"""Weight-import tests: synthetic torchvision-layout state_dict round-trip."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from podtpu.core.config import ModelConfig
from podtpu.models.detector import FasterRCNN, init_variables
from podtpu.models.weights import (
    convert_torchvision_state_dict,
    torchvision_key_map,
    _fc6_from_torch,
)


@pytest.fixture(scope="module")
def variables():
    cfg = ModelConfig(num_classes=3, image_size=(128, 128),
                      compute_dtype="float32", with_mask=True)
    model = FasterRCNN(cfg=cfg)
    return init_variables(model, jax.random.key(0))


def torch_layout_inverse(path_value, transform_name):
    """Build a torch-layout array whose converted form equals path_value."""
    v = np.asarray(path_value)
    if transform_name == "conv":      # ours HWIO -> torch OIHW
        return np.transpose(v, (3, 2, 0, 1))
    if transform_name == "dense":     # ours [in, out] -> torch [out, in]
        return np.transpose(v, (1, 0))
    return v


def make_fake_state_dict(variables, from_init=False):
    """A state_dict covering every mappable key.

    Default: recognisable random values (layout verification).  With
    ``from_init`` the values are the model's own (sane) initialisation, so
    a model loaded from the result can actually train — random-normal BN
    variances would produce NaNs.
    """
    from podtpu.models.weights import _conv, _deconv, _dense

    sd = {}
    rng = np.random.default_rng(0)
    seen_paths = set()
    for torch_key, (coll, path, transform) in torchvision_key_map().items():
        # The map contains alias keys for torchvision naming variants
        # (e.g. `inner_blocks.0` vs `inner_blocks.0.0`); a real checkpoint
        # has exactly one — emit only the first here.
        if (coll, path, torch_key.split(".")[-1]) in seen_paths:
            continue
        seen_paths.add((coll, path, torch_key.split(".")[-1]))
        # Walk our tree; skip keys that don't exist (e.g. alternate
        # torchvision naming variants).
        node = variables[coll]
        ok = True
        for k in path.split("/"):
            if k not in node:
                ok = False
                break
            node = node[k]
        if not ok:
            continue
        if from_init:
            target = np.asarray(node, np.float32)
        else:
            target = rng.normal(size=np.asarray(node).shape).astype(
                np.float32)
        if transform is _deconv:
            # ours [kH, kW, in, out] flipped -> torch [in, out, kH, kW]
            sd[torch_key] = np.ascontiguousarray(
                np.transpose(target[::-1, ::-1], (2, 3, 0, 1)))
        elif transform is _conv:
            sd[torch_key] = torch_layout_inverse(target, "conv")
        elif transform is _dense:
            if torch_key == "roi_heads.box_head.fc6.weight":
                # fc6 needs the NCHW flattening permutation.
                w = target.reshape(7, 7, 256, -1)          # H W C out
                w = np.transpose(w, (3, 2, 0, 1))          # out C H W
                sd[torch_key] = w.reshape(w.shape[0], -1)
            else:
                sd[torch_key] = torch_layout_inverse(target, "dense")
        else:
            sd[torch_key] = target
    return sd


class TestWeightImport:
    def test_all_backbone_weights_load(self, variables):
        sd = make_fake_state_dict(variables)
        out = convert_torchvision_state_dict(sd, variables)
        # conv1 kernel should equal transposed source.
        got = out["params"]["backbone"]["conv1"]["kernel"]
        want = np.transpose(sd["backbone.body.conv1.weight"], (2, 3, 1, 0))
        assert np.allclose(got, want)
        # A deep bottleneck conv.
        got = out["params"]["backbone"]["layer3_4"]["conv2"]["kernel"]
        want = np.transpose(sd["backbone.body.layer3.4.conv2.weight"],
                            (2, 3, 1, 0))
        assert np.allclose(got, want)
        # Frozen BN stats.
        got = out["frozen"]["backbone"]["layer1_0"]["bn2"]["mean"]
        assert np.allclose(got, sd["backbone.body.layer1.0.bn2.running_mean"])

    def test_fpn_rpn_and_heads_load(self, variables):
        sd = make_fake_state_dict(variables)
        out = convert_torchvision_state_dict(sd, variables)
        assert np.allclose(
            out["params"]["fpn"]["lateral2"]["bias"],
            sd["backbone.fpn.inner_blocks.0.bias"])
        assert np.allclose(
            out["params"]["rpn_head"]["objectness"]["kernel"],
            np.transpose(sd["rpn.head.cls_logits.weight"], (2, 3, 1, 0)))
        assert np.allclose(
            out["params"]["box_head"]["fc7"]["kernel"],
            np.transpose(sd["roi_heads.box_head.fc7.weight"], (1, 0)))
        assert np.allclose(
            out["params"]["mask_head"]["conv2"]["kernel"],
            np.transpose(sd["roi_heads.mask_head.mask_fcn2.weight"],
                         (2, 3, 1, 0)))

    def test_fc6_permutation_matches_pooled_layout(self, variables):
        """fc6 @ NHWC-flattened == torch fc6 @ NCHW-flattened."""
        rng = np.random.default_rng(1)
        torch_w = rng.normal(size=(1024, 256 * 7 * 7)).astype(np.float32)
        pooled_nhwc = rng.normal(size=(7, 7, 256)).astype(np.float32)
        ours = _fc6_from_torch(torch_w)
        out_ours = pooled_nhwc.reshape(-1) @ ours
        pooled_nchw = np.transpose(pooled_nhwc, (2, 0, 1)).reshape(-1)
        out_torch = torch_w @ pooled_nchw
        assert np.allclose(out_ours, out_torch, rtol=1e-4, atol=1e-3)

    def test_mismatched_head_is_skipped(self, variables):
        sd = make_fake_state_dict(variables)
        # COCO checkpoint has 91 classes; our head has 3.
        sd["roi_heads.box_predictor.cls_score.weight"] = \
            np.zeros((91, 1024), np.float32)
        sd["roi_heads.box_predictor.cls_score.bias"] = np.zeros(91, np.float32)
        before = np.asarray(variables["params"]["box_head"]["cls"]["kernel"])
        out = convert_torchvision_state_dict(sd, variables)
        assert np.allclose(out["params"]["box_head"]["cls"]["kernel"], before)

    def test_deconv_mapping_matches_torch_numerically(self):
        """flax ConvTranspose with the _deconv-mapped kernel == torch
        ConvTranspose2d, on real numbers (not just shapes)."""
        torch = pytest.importorskip("torch")
        from flax import linen as nn
        from podtpu.models.weights import _deconv

        rng = np.random.default_rng(0)
        x = rng.normal(size=(1, 3, 5, 5)).astype(np.float32)   # NCHW
        w = rng.normal(size=(3, 4, 2, 2)).astype(np.float32)   # in,out,kH,kW
        tconv = torch.nn.ConvTranspose2d(3, 4, 2, stride=2, bias=False)
        tconv.weight.data = torch.from_numpy(w)
        want = tconv(torch.from_numpy(x)).detach().numpy()

        class F(nn.Module):
            @nn.compact
            def __call__(self, x):
                return nn.ConvTranspose(4, (2, 2), strides=(2, 2),
                                        use_bias=False, name="d")(x)

        got = F().apply({"params": {"d": {"kernel": jnp.asarray(_deconv(w))}}},
                        jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
        got = np.transpose(np.asarray(got), (0, 3, 1, 2))
        assert np.allclose(got, want, atol=1e-4)

    def test_real_pth_roundtrip_coco_shapes(self, variables, tmp_path):
        """Serialise a COCO-shaped (91-class) state_dict with torch.save and
        run it through ``load_pretrained`` — the exact user journey with the
        reference's preloaded checkpoint (`/root/reference/Dockerfile:5`).
        Every backbone/FPN/RPN/box-MLP tensor must import; only the
        class-count-dependent predictor heads may be skipped."""
        torch = pytest.importorskip("torch")
        from podtpu.models.weights import (convert_torchvision_state_dict,
                                           load_pretrained)

        sd = make_fake_state_dict(variables)
        # COCO head shapes (91 classes), as in the real checkpoint.
        sd["roi_heads.box_predictor.cls_score.weight"] = \
            np.zeros((91, 1024), np.float32)
        sd["roi_heads.box_predictor.cls_score.bias"] = \
            np.zeros((91,), np.float32)
        sd["roi_heads.box_predictor.bbox_pred.weight"] = \
            np.zeros((91 * 4, 1024), np.float32)
        sd["roi_heads.box_predictor.bbox_pred.bias"] = \
            np.zeros((91 * 4,), np.float32)
        tsd = {k: torch.from_numpy(np.ascontiguousarray(v))
               for k, v in sd.items()}
        path = tmp_path / "fasterrcnn_resnet50_fpn_coco.pth"
        torch.save(tsd, str(path))

        out = load_pretrained(variables, str(path), verbose=False)
        # Backbone conv survived the torch round trip bit-exactly.
        got = out["params"]["backbone"]["conv1"]["kernel"]
        want = np.transpose(sd["backbone.body.conv1.weight"], (2, 3, 1, 0))
        assert np.allclose(got, want)

        # Import completeness: nothing skipped except the 4 predictor heads.
        _, (loaded, skipped) = convert_torchvision_state_dict(
            {k: np.asarray(v) for k, v in sd.items()}, variables,
            return_stats=True)
        head_keys = {k for k in skipped if "box_predictor" in k}
        assert len(head_keys) == 4
        non_head = [k for k in skipped if "box_predictor" not in k]
        assert non_head == [], f"unexpectedly skipped: {non_head}"
        assert loaded == len(sd) - 4

    def test_train_with_pretrained_pth(self, variables, tmp_path):
        """The product path: train(pretrained=<.pth>) imports the checkpoint
        and completes an epoch (the reference preloads the COCO .pth in its
        Dockerfile and always fine-tunes from it)."""
        torch = pytest.importorskip("torch")
        from podtpu.train.train import train
        from tests.conftest import tiny_config
        from tests.synthetic import make_project

        sd = make_fake_state_dict(variables, from_init=True)
        tsd = {k: torch.from_numpy(np.ascontiguousarray(v))
               for k, v in sd.items()}
        pth = tmp_path / "pretrained.pth"
        torch.save(tsd, str(pth))

        project = make_project(str(tmp_path / "imgs"), num_images=4)
        out = train(project, labels=["particle"],
                    output_dir=str(tmp_path / "models"), name="pre",
                    batch_size=2, max_epochs=1, alrs_epochs=2,
                    alrs_startup_factor=1, config=tiny_config(),
                    num_workers=2, pretrained=str(pth))
        assert (tmp_path / "models" / "pre" / "model.msgpack").exists()
        # WITH pretrained weights the default 3-stage freeze stays
        # (protecting the imported early features, torchvision semantics).
        import json
        with open(tmp_path / "models" / "pre" / "config.json") as fp:
            saved = json.load(fp)
        assert saved["model"]["trainable_backbone_stages"] == 3

        # Resuming WITHOUT re-passing --pretrained must rebuild the same
        # architecture/optimizer from the checkpoint's stored config (NOT
        # auto-unfreeze to 5, which would break the pickled masked
        # opt_state's pytree structure).
        out2 = train(project, labels=["particle"],
                     output_dir=str(tmp_path / "models"), name="pre",
                     batch_size=2, max_epochs=2, alrs_epochs=2,
                     alrs_startup_factor=1, config=tiny_config(),
                     num_workers=2, resume=True)
        with open(tmp_path / "models" / "pre" / "config.json") as fp:
            saved2 = json.load(fp)
        assert saved2["model"]["trainable_backbone_stages"] == 3

    def test_forward_runs_with_imported_weights(self, variables):
        sd = make_fake_state_dict(variables)
        out = convert_torchvision_state_dict(sd, variables)
        cfg = ModelConfig(num_classes=3, image_size=(128, 128),
                          compute_dtype="float32", with_mask=True,
                          rpn_pre_nms_topk_test=64, rpn_post_nms_topk_test=32,
                          detections_per_image=8)
        model = FasterRCNN(cfg=cfg)
        images = jnp.zeros((1, 128, 128, 3), jnp.float32)
        det, masks = model.apply(
            jax.tree.map(jnp.asarray, out), images, train=False)
        assert np.isfinite(np.asarray(det.boxes)).all()
