"""PAUT data layer: grammar, parsers, rendering, windowing, datasets, prefetch."""

from pautdx.data.grammar import (  # noqa: F401
    HEALTH_LABEL, ScanInfo, parse_scan_filename, parse_scan_key,
)
from pautdx.data.volume import ParsedVolume, parse_json_volume, parse_txt_tree  # noqa: F401
from pautdx.data.datasets import (  # noqa: F401
    BatchIterator, SignalSequences, defect_focused, load_json_dir,
    sequences_from_volume, train_val_split,
)
from pautdx.data.prefetch import device_prefetch, prefetch_to_device  # noqa: F401
from pautdx.data.summary import summarize_collection  # noqa: F401
