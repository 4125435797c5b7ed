from .fleet import (
    batched_mpc,
    sharded_mpc,
    make_scenario_batch,
    scenario_mesh,
    fleet_summary,
    sharded_fleet_summary,
)
from .mesh import init_distributed, fleet_mesh, scaling_report
from .tensor import op_mesh, row_sharded_predict, row_sharded_rollout, dp_tp_rollout
