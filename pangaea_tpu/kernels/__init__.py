from pangaea_tpu.kernels.encode import (  # noqa: F401
    encode_bases,
    revcomp_kmers,
    canonical_kmers,
    kmer_window_values,
    canonical_rank_lut,
    num_canonical_kmers,
)
from pangaea_tpu.kernels.features import (  # noqa: F401
    count_kmers_global,
    abundance_histogram,
    tnf_histogram,
    make_global_table,
)
