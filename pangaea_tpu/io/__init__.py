from pangaea_tpu.io.fastq import (  # noqa: F401
    BarcodeParser,
    open_maybe_gzip,
    iter_fastq_records,
    iter_interleaved_pairs,
    iter_paired_pairs,
)
from pangaea_tpu.io.grouping import iter_barcode_groups, ReadPair  # noqa: F401
from pangaea_tpu.io.packing import GroupPacker, ReadPacker, PackedBatch  # noqa: F401
