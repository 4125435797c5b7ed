from .dmdc import (
    DMDcModel,
    DiscrepDMDc,
    OnlineDMDc,
    dmdc_from_operator,
    discrep_from_data,
    discrep_from_randn,
    discrep_bootstrap,
    discrep_fit_iteration,
    discrep_append,
    online_from_bootstrap,
    online_from_randn,
    online_from_data,
    online_fit_iteration,
    predict,
    get_discrete,
)
from .training import train_model, prediction_loss
