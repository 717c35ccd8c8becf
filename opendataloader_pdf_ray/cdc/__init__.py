from .backfill import backfill, resolve_backfill_epoch
from .changefeed import changes
from .derive import FilteredTransform, derive, follow_derive
from .restore import apply_restore
from .replicate import replicate
from .rescale import rescale
from .seed import seed_from_warc
from .dupindex import DupIndex
from .ingest import (ApplyPartition, ApplyPartitionBacklog, dup_index_root,
                     ingest_epoch, ingest_epochs, near_index_root,
                     num_epochs_in, replay, url_partition)
from .neardup import NearDupIndex
from .textindex import TextIndex, text_index_root
from .trigramindex import SubstringIndex, substr_index_root
from .vecindex import VectorIndex, vec_index_root
from .colindex import ColumnIndex, col_index_root, list_col_indexes
from .rangeindex import RangeIndex, list_range_indexes, range_index_root
from .lake import Lake, Lineage, WriterFencedError
from .merge import (
    ensure_deleted_col,
    latest_per_key,
    live_view,
    merge_base_with_updates,
    unified_schema,
    unify_to_schema,
)
from .oracle import oracle_final_state, oracle_live_texts
from .views import MaterializedView, group_lang, value_text_len

__all__ = [
    "DupIndex", "dup_index_root", "NearDupIndex", "near_index_root",
    "TextIndex", "text_index_root", "VectorIndex", "vec_index_root",
    "SubstringIndex", "substr_index_root",
    "ColumnIndex", "col_index_root", "list_col_indexes",
    "RangeIndex", "range_index_root", "list_range_indexes",
    "apply_restore",
    "backfill", "resolve_backfill_epoch", "changes", "replicate",
    "FilteredTransform", "derive", "follow_derive",
    "rescale",
    "seed_from_warc",
    "ApplyPartition", "ApplyPartitionBacklog", "ingest_epoch", "ingest_epochs",
    "num_epochs_in", "replay", "url_partition",
    "Lake", "Lineage", "WriterFencedError", "ensure_deleted_col",
    "latest_per_key", "live_view",
    "merge_base_with_updates", "unified_schema", "unify_to_schema",
    "oracle_final_state", "oracle_live_texts",
    "MaterializedView", "group_lang", "value_text_len",
]
