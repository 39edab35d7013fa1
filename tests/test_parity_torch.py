"""Golden-value parity: our JAX VTAMIQ vs the torch reference implementation.

Builds the reference model (pretrained=False) from /root/reference (with
timm shims), copies its randomly-initialized weights into our param pytree,
and compares forward outputs on identical inputs. This is the strongest
correctness check available without the (absent) pretrained npz weights —
SURVEY.md §4: "golden-value tests for ViT forward... tolerance vs reference
activations".
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reference_shim import install_reference, reference_available

from vtamiq_tpu.models.configs import get_vit_config, VTAMIQConfig
from vtamiq_tpu.models.vit import init_vit_params, vit_forward
from vtamiq_tpu.models.vtamiq import init_vtamiq_params, vtamiq_forward

HAVE_REF = reference_available() and install_reference()

pytestmark = pytest.mark.skipif(not HAVE_REF, reason="torch reference unavailable")

# small-but-real configuration: full hidden size (exercises the B16
# P*P*3 == hidden ambiguity), 2 encoder layers for speed
NUM_LAYERS = 2
NUM_EXTRA = 8
NUM_RGS = 2
NUM_RCABS = 2


def t2a(t):
    return np.asarray(t.detach().cpu().numpy(), dtype=np.float32)


def build_reference_model():
    import torch
    from modules.vtamiq.vtamiq import VTAMIQ

    torch.manual_seed(0)
    model = VTAMIQ(
        vit_config=dict(
            variant="ViT-B16",
            pretrained=False,
            num_keep_layers=NUM_LAYERS,
            num_extra_tokens=NUM_EXTRA,
            num_scales=0,
            num_adapters=0,
            use_layer_scale=True,
            path_drop_prob=0.1,
        ),
        calibrate=True,
        diff_scale=True,
        num_rgs=NUM_RGS,
        num_rcabs=NUM_RCABS,
        ca_reduction=16,
        rg_path_drop=0.1,
        predictor_dropout=0.1,
    )
    model.eval()
    return model


def our_config() -> VTAMIQConfig:
    return VTAMIQConfig(
        vit=get_vit_config(num_keep_layers=NUM_LAYERS, num_extra_tokens=NUM_EXTRA),
        num_rgs=NUM_RGS, num_rcabs=NUM_RCABS, ca_reduction=16,
    )


def import_torch_state(model, cfg: VTAMIQConfig):
    """Map the reference state dict into our param pytree.

    torch Linear weights are (out, in) -> transposed to our (in, out);
    Conv1d k=1 weights are (out, in, 1) -> squeezed + transposed;
    the Conv2d patch embedding (H, 3, P, P) OIHW -> (P, P, 3, H) HWIO flat.
    """
    sd = {k: t2a(v) for k, v in model.state_dict().items()}
    h = cfg.vit.hidden_size

    params = init_vtamiq_params(jax.random.PRNGKey(0), cfg)
    vit = params["vit"]
    emb = vit["embeddings"]

    pk = sd["transformer.embeddings.patch_embeddings.weight"]  # (H, 3, P, P)
    emb["patch"]["kernel"] = jnp.asarray(pk.transpose(2, 3, 1, 0).reshape(-1, h))
    emb["patch"]["bias"] = jnp.asarray(sd["transformer.embeddings.patch_embeddings.bias"])
    emb["cls_token"] = jnp.asarray(sd["transformer.embeddings.cls_token"].reshape(-1))
    emb["extra_tokens"] = jnp.asarray(
        sd["transformer.embeddings.extra_tokens"].reshape(NUM_EXTRA, h))
    emb["pos_embeddings"] = jnp.asarray(
        sd["transformer.embeddings.positional_embeddings.positional_embeddings"]
        .reshape(-1, h))

    for i in range(NUM_LAYERS):
        ours = vit["encoder"]["layers"][f"layer_{i}"]
        pre = f"transformer.encoder.layers.{i}"
        for name in ("query", "key", "value", "out"):
            ours["attn"][name]["kernel"] = jnp.asarray(sd[f"{pre}.attn.{name}.weight"].T)
            ours["attn"][name]["bias"] = jnp.asarray(sd[f"{pre}.attn.{name}.bias"])
        ours["mlp"]["fc1"]["kernel"] = jnp.asarray(sd[f"{pre}.ffn.fc1.weight"].T)
        ours["mlp"]["fc1"]["bias"] = jnp.asarray(sd[f"{pre}.ffn.fc1.bias"])
        ours["mlp"]["fc2"]["kernel"] = jnp.asarray(sd[f"{pre}.ffn.fc2.weight"].T)
        ours["mlp"]["fc2"]["bias"] = jnp.asarray(sd[f"{pre}.ffn.fc2.bias"])
        ours["ln1"]["scale"] = jnp.asarray(sd[f"{pre}.attention_norm.weight"])
        ours["ln1"]["bias"] = jnp.asarray(sd[f"{pre}.attention_norm.bias"])
        ours["ln2"]["scale"] = jnp.asarray(sd[f"{pre}.ffn_norm.weight"])
        ours["ln2"]["bias"] = jnp.asarray(sd[f"{pre}.ffn_norm.bias"])
        ours["ls1"] = jnp.asarray(sd[f"{pre}.ls1.gamma"])
        ours["ls2"] = jnp.asarray(sd[f"{pre}.ls2.gamma"])

    vit["encoder"]["final_ln"]["scale"] = jnp.asarray(sd["transformer.encoder.encoder_norm.weight"])
    vit["encoder"]["final_ln"]["bias"] = jnp.asarray(sd["transformer.encoder.encoder_norm.bias"])

    params["diff_scale"] = jnp.asarray(sd["diff_scale.gamma"])

    def conv1d(key):
        return jnp.asarray(sd[key][:, :, 0].T)  # (out, in, 1) -> (in, out)

    qd = params["quality_decoder"]
    for g in range(NUM_RGS):
        rg = qd["rgs"][f"rg_{g}"]
        for r in range(NUM_RCABS):
            pre = f"quality_decoder.{g}.body.{r}.body"
            rcab = rg["rcabs"][f"rcab_{r}"]
            rcab["prelu"] = jnp.asarray(sd[f"{pre}.1.weight"].reshape(()))
            rcab["conv"]["kernel"] = conv1d(f"{pre}.2.weight")
            rcab["conv"]["bias"] = jnp.asarray(sd[f"{pre}.2.bias"])
            rcab["ca"]["down"]["kernel"] = conv1d(f"{pre}.4.conv_du.1.weight")
            rcab["ca"]["down"]["bias"] = jnp.asarray(sd[f"{pre}.4.conv_du.1.bias"])
            rcab["ca"]["up"]["kernel"] = conv1d(f"{pre}.4.conv_du.4.weight")
            rcab["ca"]["up"]["bias"] = jnp.asarray(sd[f"{pre}.4.conv_du.4.bias"])
        rg["conv"]["kernel"] = conv1d(f"quality_decoder.{g}.body.{NUM_RCABS}.weight")
        rg["conv"]["bias"] = jnp.asarray(sd[f"quality_decoder.{g}.body.{NUM_RCABS}.bias"])
    qd["conv"]["kernel"] = conv1d(f"quality_decoder.{NUM_RGS}.weight")
    qd["conv"]["bias"] = jnp.asarray(sd[f"quality_decoder.{NUM_RGS}.bias"])

    qp = params["q_predictor"]
    qp["fc1"]["kernel"] = jnp.asarray(sd["q_predictor.1.weight"].T)
    qp["fc1"]["bias"] = jnp.asarray(sd["q_predictor.1.bias"])
    qp["prelu"] = jnp.asarray(sd["q_predictor.2.weight"].reshape(()))
    qp["fc2"]["kernel"] = jnp.asarray(sd["q_predictor.4.weight"].T)
    qp["fc2"]["bias"] = jnp.asarray(sd["q_predictor.4.bias"])
    return params


@pytest.fixture(scope="module")
def synced():
    model = build_reference_model()
    cfg = our_config()
    params = import_torch_state(model, cfg)
    return model, cfg, params


def make_pair_inputs(b=2, n=24, p=16, seed=0):
    rng = np.random.default_rng(seed)
    patches = rng.normal(size=(b, 2, n, p, p, 3)).astype(np.float32) * 0.5
    pos = rng.uniform(0, 1 - 1e-6, size=(b, 2, n, 2)).astype(np.float32)
    return patches, pos


class TestViTParity:
    def test_tokens_match(self, synced):
        import torch
        model, cfg, params = synced
        patches, pos = make_pair_inputs(b=2, n=24)
        p_ref, uv_ref = patches[:, 0], pos[:, 0]

        # torch expects (B, N, C, P, P)
        with torch.no_grad():
            t_out, _, _ = model.forward_vit(
                torch.from_numpy(p_ref.transpose(0, 1, 4, 2, 3).copy()),
                torch.from_numpy(uv_ref.copy()),
                None, tokens_only=True)
        j_out = vit_forward(params["vit"], cfg.vit, jnp.asarray(p_ref),
                            jnp.asarray(uv_ref), compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(j_out), t2a(t_out),
                                   rtol=2e-4, atol=2e-4)


class TestVTAMIQParity:
    def test_q_matches(self, synced):
        import torch
        model, cfg, params = synced
        patches, pos = make_pair_inputs(b=3, n=24, seed=1)

        with torch.no_grad():
            t_patches = torch.from_numpy(patches.transpose(0, 1, 2, 5, 3, 4).copy())
            t_pos = torch.from_numpy(pos.copy())
            q_t, _ = model(
                (t_patches[:, 0].contiguous(), t_patches[:, 1].contiguous()),
                (t_pos[:, 0].contiguous(), t_pos[:, 1].contiguous()),
                (None, None))
        q_j = vtamiq_forward(params, cfg, jnp.asarray(patches), jnp.asarray(pos),
                             compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(q_j), t2a(q_t), rtol=5e-4, atol=5e-4)


class TestLossParity:
    """Our jax losses vs the reference's torch loss functions on identical
    inputs (train.py:325-395)."""

    def test_rank_and_pears_match_reference(self):
        import torch
        import importlib
        ref_train = importlib.import_module("train")

        from vtamiq_tpu.ops.losses import rank_loss, pears_loss, mae_loss
        rng = np.random.default_rng(7)
        for trial in range(3):
            d = rng.normal(size=10).astype(np.float32)
            y = rng.uniform(0, 1, 10).astype(np.float32)
            td, ty = torch.from_numpy(d), torch.from_numpy(y)

            ref_rank = float(ref_train.rank_loss(td, ty, 10))
            ref_pears = float(ref_train.pears_loss(td, ty))
            ref_mae = float(ref_train.mae_loss(td, ty))

            assert abs(float(rank_loss(jnp.asarray(d), jnp.asarray(y))) - ref_rank) < 1e-5
            assert abs(float(pears_loss(jnp.asarray(d), jnp.asarray(y))) - ref_pears) < 1e-5
            assert abs(float(mae_loss(jnp.asarray(d), jnp.asarray(y))) - ref_mae) < 1e-6

    def test_loss_func_iqa_total_matches_reference(self):
        import torch
        import importlib
        ref_train = importlib.import_module("train")
        from vtamiq_tpu.ops.losses import loss_func_iqa
        rng = np.random.default_rng(8)
        d = rng.normal(size=8).astype(np.float32)
        y = rng.uniform(0, 1, 8).astype(np.float32)
        ref_total, ref_mae, ref_rank, ref_pears = ref_train.loss_func_iqa(
            torch.from_numpy(d), torch.from_numpy(y), 8, "cpu", 0.75, 1.0, 0.2)
        total, aux = loss_func_iqa(jnp.asarray(d), jnp.asarray(y))
        assert abs(float(total) - float(ref_total)) < 1e-5
        assert abs(float(aux["mae"]) - ref_mae) < 1e-6
        assert abs(float(aux["rank"]) - ref_rank) < 1e-5
        assert abs(float(aux["pears"]) - ref_pears) < 1e-5


class TestCorrelationsParity:
    def test_full_metric_dict_matches_reference(self):
        """SROCC/KROCC/PLCC/RMSE (+ NOFIT) equal the reference's
        compute_correlations on identical arrays (utils/misc/correlations.py)."""
        import importlib
        ref_cors = importlib.import_module("utils.misc.correlations")
        from vtamiq_tpu.ops.correlations import compute_correlations
        rng = np.random.default_rng(11)
        a = rng.uniform(0, 1, 60)
        b = np.clip(a + rng.normal(0, 0.15, 60), 0, 1.2)
        ours = compute_correlations(a, b)
        theirs = ref_cors.compute_correlations(a, b)
        for field in ("SROCC", "KROCC", "PLCC_NOFIT", "RMSE_NOFIT"):
            assert abs(ours[field] - theirs[field]) < 1e-9, field
        # fitted PLCC/RMSE depend on the leastsq trajectory; same family,
        # same initialization -> agree tightly
        assert abs(ours["PLCC"] - theirs["PLCC"]) < 1e-6
        assert abs(ours["RMSE"] - theirs["RMSE"]) < 1e-6

    def test_fit_function_matches_reference(self):
        import importlib
        ref_cors = importlib.import_module("utils.misc.correlations")
        from vtamiq_tpu.ops.fitting import FitFunction
        rng = np.random.default_rng(12)
        x = np.sort(rng.uniform(0, 1, 100))
        y = 1.0 / (1.0 + np.exp(-6.0 * (x - 0.4))) + rng.normal(0, 0.01, 100)
        ours = FitFunction(x, y)
        theirs = ref_cors.FitFunction(x, y)
        grid = np.linspace(0, 1, 50)
        np.testing.assert_allclose(ours(grid), theirs(grid), rtol=1e-4, atol=1e-4)


class TestSchedulerTrajectoryParity:
    """Exact per-epoch LR trajectories vs torch.optim.lr_scheduler — the
    reference steps LambdaLR/CosineAnnealingLR/MultiStepLR once per epoch
    (train.py:26-119,578). Our schedule maps optimizer-update counts to the
    SAME LR the reference would use during that epoch."""

    def _torch_lrs(self, scheduler_ctor, lr, num_epochs):
        import torch
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=lr)
        sched = scheduler_ctor(opt)
        lrs = []
        for _ in range(num_epochs):
            lrs.append(opt.param_groups[0]["lr"])  # LR used during this epoch
            opt.step()
            sched.step()
        return lrs

    def _our_lrs(self, conf, steps_per_epoch, num_epochs):
        from vtamiq_tpu.train.optim import make_lr_schedule
        s = make_lr_schedule(conf, steps_per_epoch)
        # LR at the first update of each epoch (and assert it is constant
        # within the epoch for per-epoch stepping)
        lrs = []
        for e in range(num_epochs):
            first = float(s(e * steps_per_epoch))
            last = float(s((e + 1) * steps_per_epoch - 1))
            assert abs(first - last) < 1e-12
            lrs.append(first)
        return lrs

    def _conf(self, **kw):
        base = dict(optimizer="AdamW", optimizer_weight_decay=0.01,
                    optimizer_learning_rate=5e-5,
                    scheduler_step_per_batch=False,
                    scheduler_type="lambda",
                    optimizer_learning_rate_decay_lambda_goal=0.01,
                    num_epochs=10,
                    optimizer_decay_after_n_epochs=[3, 7],
                    optimizer_learning_rate_decay_multistep=0.1,
                    optimizer_learning_rate_decay_cosine=0.01,
                    optimizer_sgd_momentum=0.9, optimizer_sgd_nesterov=True)
        base.update(kw)
        return base

    def test_lambda_matches_torch_lambdalr(self):
        import torch
        conf = self._conf()
        lr, n = 5e-5, 10
        ratio = 0.01 ** (1.0 / n)
        theirs = self._torch_lrs(
            lambda o: torch.optim.lr_scheduler.LambdaLR(o, lambda s: ratio ** s),
            lr, n)
        ours = self._our_lrs(conf, steps_per_epoch=7, num_epochs=n)
        np.testing.assert_allclose(ours, theirs, rtol=1e-10)

    def test_multistep_matches_torch(self):
        import torch
        conf = self._conf(scheduler_type="multistep")
        lr, n = 5e-5, 10
        theirs = self._torch_lrs(
            lambda o: torch.optim.lr_scheduler.MultiStepLR(
                o, milestones=[3, 7], gamma=0.1), lr, n)
        ours = self._our_lrs(conf, steps_per_epoch=4, num_epochs=n)
        np.testing.assert_allclose(ours, theirs, rtol=1e-7)

    def test_cosine_matches_torch(self):
        import torch
        conf = self._conf(scheduler_type="cosine")
        lr, n = 5e-5, 10
        theirs = self._torch_lrs(
            lambda o: torch.optim.lr_scheduler.CosineAnnealingLR(
                o, T_max=n, eta_min=0.01 * lr), lr, n)
        ours = self._our_lrs(conf, steps_per_epoch=3, num_epochs=n)
        np.testing.assert_allclose(ours, theirs, rtol=1e-6)

    def test_lambda_per_batch(self):
        import torch
        conf = self._conf(scheduler_step_per_batch=True, num_epochs=2)
        from vtamiq_tpu.train.optim import make_lr_schedule
        spe = 5
        s = make_lr_schedule(conf, spe)
        num_steps = 2 * spe
        ratio = 0.01 ** (1.0 / num_steps)
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=5e-5)
        sched = torch.optim.lr_scheduler.LambdaLR(opt, lambda st: ratio ** st)
        for step in range(num_steps):
            torch_lr = opt.param_groups[0]["lr"]
            assert abs(float(s(step)) - torch_lr) < 1e-15, step
            opt.step()
            sched.step()
