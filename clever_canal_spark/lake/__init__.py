from .agg_view import (
    agg_view_config,
    agg_view_cursor,
    create_agg_view,
    open_agg_view,
    reseed_agg_view,
    sync_agg_view,
)
from .consumers import Batch, Consumer
from .diff import snapshot_diff
from .fs import ArrowFS, LocalFS, MemFS, MetadataFS
from .rollup import (
    bootstrap_rollup,
    create_rollup,
    hot_groups,
    rollup_cursor,
    sync_rollup,
)
from .consistency import (
    consistent_scans,
    consistent_versions,
    latest_consistent_epoch,
    version_at_epoch,
)
from .advisor import maintenance_report
from .erase import EraseResult, erase_rows
from .join_view import (
    bootstrap_join_view,
    create_join_view,
    join_view_config,
    join_view_cursor,
    join_view_lag,
    sync_join_view,
)
from .fsck import check_table
from .lineage import expr_lineage, rename_impact, view_lineage
from .provenance import row_provenance
from .transform_view import (
    create_transform_view,
    open_transform_view,
    reseed_transform_view,
    sync_transform_view,
    transform_view_config,
    transform_view_cursor,
)
from .replica import (
    create_replica,
    replica_cursor,
    replica_lag,
    sync_replica,
)
from .table import CommitConflict, LakeTable, MergeResult, SnapshotExpired
from .wap import (
    PublishConflict,
    branch_table,
    drop_branch,
    fork_branch,
    list_branches,
    publish_branch,
)

# after .table: sketch_view pulls in operators/, whose ann_index imports
# LakeTable back out of this (then partially-initialized) package
from .sketch_view import (  # noqa: E402
    bootstrap_cms_view,
    bootstrap_hist_view,
    bootstrap_hll_view,
    cms_view_config,
    cms_view_estimate,
    create_cms_view,
    create_hist_view,
    create_hll_view,
    hll_view_config,
    hll_view_estimates,
    hist_view_quantiles,
    sync_cms_view,
    sync_hist_view,
    sync_hll_view,
)

__all__ = [
    "LakeTable", "MergeResult", "CommitConflict", "SnapshotExpired",
    "MetadataFS", "LocalFS", "ArrowFS", "MemFS",
    "create_rollup", "sync_rollup", "hot_groups", "rollup_cursor",
    "bootstrap_rollup",
    "create_agg_view", "sync_agg_view", "reseed_agg_view", "open_agg_view",
    "agg_view_cursor", "agg_view_config",
    "create_hll_view", "sync_hll_view", "hll_view_estimates", "hll_view_config",
    "create_cms_view", "sync_cms_view", "cms_view_estimate", "cms_view_config",
    "create_hist_view", "sync_hist_view", "hist_view_quantiles",
    "bootstrap_hll_view", "bootstrap_cms_view", "bootstrap_hist_view",
    "maintenance_report",
    "create_join_view", "sync_join_view", "bootstrap_join_view",
    "join_view_cursor", "join_view_config", "join_view_lag",
    "Consumer", "Batch", "snapshot_diff", "EraseResult", "erase_rows", "check_table",
    "PublishConflict", "fork_branch", "branch_table", "list_branches",
    "publish_branch", "drop_branch",
    "version_at_epoch", "latest_consistent_epoch", "consistent_versions",
    "consistent_scans",
    "create_replica", "sync_replica", "replica_cursor", "replica_lag",
    "create_transform_view", "sync_transform_view", "reseed_transform_view",
    "open_transform_view", "transform_view_config", "transform_view_cursor",
    "row_provenance",
    "expr_lineage", "view_lineage", "rename_impact",
]
