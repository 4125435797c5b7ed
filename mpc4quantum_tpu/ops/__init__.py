from .library import (
    control_powers,
    size_of_library,
    lift_controls,
    diff_lift_controls,
    krtimes,
)
from .liouville import vectorize_me, discretize_homogeneous, liouville_generator
from .bilinear import BilinearModel, model_along_traj, model_from_initial
from .expm import expm_pade, expm_taylor, propagators_from_controls
