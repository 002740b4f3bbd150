from .admission import AdmissionResult, dedup_admission
from .apply import ApplyConfig, ApplyResult, BatchHints, apply_epoch, bootstrap_epoch, bootstrap_in_chunks
from .dml import DmlResult, delete_where, update_where
from .flashback import FlashbackPlan, plan_flashback, revert_epoch
from .route import Route, route_epoch
from .ddl import apply_ddl_idempotent
from .patch import apply_patch_epoch

__all__ = [
    "ApplyConfig", "ApplyResult", "BatchHints", "apply_epoch",
    "apply_ddl_idempotent", "bootstrap_epoch", "bootstrap_in_chunks", "Route", "route_epoch",
    "AdmissionResult", "dedup_admission",
    "DmlResult", "delete_where", "update_where",
    "FlashbackPlan", "plan_flashback", "revert_epoch",
    "apply_patch_epoch",
]
