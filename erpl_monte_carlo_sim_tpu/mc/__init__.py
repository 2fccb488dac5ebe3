"""Monte Carlo layer: dispersion sampling, vmapped execution, masked stats."""

from .analyzer import MonteCarloAnalyzer
from .cv import CVMoments, control_names, cv_slab_moments, finalize_cv
from .dispersions import (
    DispersionSample,
    UncertaintyParams,
    inject_reference_lanes,
    normal_dims,
    sample_dispersions,
    sample_from_normals,
    scene_in_axes,
    select_lane,
)
from .subset import (
    pool_subset_quantiles,
    pool_subset_runs,
    subset_quantile,
    subset_simulation,
)
from .envelope import EnvelopeAccumulator, EnvelopeConfig, trajectory_channel
from .filter import OutlierBounds, decode_reasons, outlier_mask
from .importance import (
    auto_shift,
    log_weights,
    shift_from_gradients,
    weighted_mean,
    weighted_tail,
)
from .two_level import parity_twin, two_level_block
from .stats import (
    PERCENTILES,
    exceedance,
    exceedance_from_analysis,
    masked_stats,
    order_stat_ranks,
    percentile_ci,
)
from .robust import dispersed_objective_and_grad, optimize_robust
from .sequential import (
    ExceedanceDecision,
    ExceedanceHalfwidth,
    MeanStderr,
    QmcMeanStderr,
    QuantileHalfwidth,
    parse_criterion,
)
from .sobol_indices import (
    active_groups,
    jansen_estimates,
    pure_interactions,
    select_interaction_pairs,
    sobol_indices,
)
from .tail import TailReservoir, fit_gpd_pwm, gpd_tail, tail_from_analysis
from .ensemble import EnsembleAccumulator, member_exceedance

__all__ = [
    "sobol_indices", "jansen_estimates", "active_groups",
    "select_interaction_pairs", "pure_interactions",
    "dispersed_objective_and_grad", "optimize_robust",
    "MonteCarloAnalyzer", "DispersionSample", "UncertaintyParams",
    "sample_dispersions", "sample_from_normals", "normal_dims",
    "inject_reference_lanes",
    "pool_subset_runs", "pool_subset_quantiles",
    "subset_simulation", "subset_quantile",
    "scene_in_axes", "select_lane", "OutlierBounds",
    "decode_reasons",
    "outlier_mask", "PERCENTILES", "masked_stats",
    "percentile_ci", "order_stat_ranks",
    "CVMoments", "control_names", "cv_slab_moments", "finalize_cv",
    "exceedance", "exceedance_from_analysis",
    "log_weights", "weighted_mean", "weighted_tail",
    "auto_shift", "shift_from_gradients",
    "parity_twin", "two_level_block",
    "MeanStderr", "QmcMeanStderr", "ExceedanceDecision",
    "ExceedanceHalfwidth", "QuantileHalfwidth", "parse_criterion",
    "TailReservoir", "fit_gpd_pwm", "gpd_tail", "tail_from_analysis",
    "EnsembleAccumulator", "member_exceedance",
    "EnvelopeAccumulator", "EnvelopeConfig", "trajectory_channel",
]
