"""Unified typed configuration for the whole pipeline.

The reference scatters hyperparameters across three uncoordinated layers
(bash getopt in src/run_pangaea:57-87, argparse in src/pangaea.py:130-171,
and per-binary cmdline.h defaults that can disagree, e.g. min_len 1000 in
count_kmer.cpp:118 vs 2000 passed in). Here everything lives in one
dataclass tree with the *effective* reference defaults (the values the
Python layer actually passes down).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional


@dataclass
class FeatureConfig:
    """Feature-extraction knobs (reference: src/pangaea.py:138-142)."""

    kmer: int = 15            # abundance k-mer (-k)
    tnf_kmer: int = 4         # TNF k-mer (-tnf_k); long reads use 3
    window_size: int = 10     # abundance histogram bin width (-s)
    vector_size: int = 400    # abundance histogram bins (-v)
    min_length: int = 2000    # min concatenated barcode length (-l)
    # Replicate the reference's barcode boundary leak: a read pair is
    # appended to the running per-barcode group *before* the barcode-change
    # check (count_kmer.cpp:199-219 paired, :246-270 interleaved), so the
    # first pair of each new barcode lands in the previous barcode's group.
    # Required for byte-identical feature CSVs.
    bug_compat_boundary_leak: bool = True
    # jellyfish --min-qual-char=? is always applied on the paired-reads
    # path (src/feature.py:76-86) and never on the interleaved path
    # (src/feature.py:94); the extractor applies this setting to the
    # global pass only when reads come as -1/-2. None = no masking.
    min_qual_char: Optional[str] = "?"
    # Host-side streaming batch geometry for the TPU kernels.
    reads_per_batch: int = 65536
    max_read_len: int = 256
    # Pre-scan a read-length sample and pack rows at the observed maximum
    # (rounded up to 8) instead of max_read_len: padding windows beyond
    # the read carry the sort/histogram sentinel but still cost compute
    # (150 bp reads in 256-wide rows waste ~44% of the feature pass).
    # A longer read appearing later is still exact: the python packer
    # splits it across continuation rows; the native path raises and the
    # extractor retries once at max_read_len.
    auto_row_len: bool = True
    # Group-histogram implementation: 'auto', 'scatter', 'segsum', or
    # 'sortjoin'. See kernels/features.py — XLA TPU serializes per-element
    # scatters at ~15 ns/update, so the scatter-free segsum path is ~2-5x
    # faster on TPU; the sort-join path additionally replaces the global
    # k-mer table (scatter build + gather lookups) with two device sorts
    # and reads the FASTQ once instead of twice. 'auto' = sortjoin when
    # eligible (accelerator backend; interleaved OR paired input — the
    # paired quality-masked global pass runs as the weighted join), else
    # segsum on accelerators, scatter on the CPU backend.
    hist_impl: str = "auto"
    # Host->device code-matrix transfer packing: 'auto' (on for
    # accelerator backends, off for CPU where there is no transfer to
    # save), 'on', or 'off'. Codes travel 2-bit packed plus a 1-bit
    # invalid mask (2.67x less traffic) and are unpacked on-device by
    # cheap VPU shifts; byte-equality with unpacked transfers is tested.
    pack_transfers: str = "auto"
    # Device window cap: k-mer windows held/sorted on the device at once
    # (int32 key per window + sort workspace; 256M windows ~= 1 GiB of
    # keys, ~5 GiB peak through the sort). Datasets beyond it still run
    # sort-join: keys spill to host RAM and join one key-value range at a
    # time (features._chunked_sortjoin_bins), each range within this cap.
    # On the sharded extractor the cap scales with the mesh instead and
    # overflow restarts on the key-range-sharded table path.
    sortjoin_max_windows: int = 256 * 1024 * 1024
    # Past-the-cap spill implementation: 'auto'/'on' pre-aggregates each
    # in-cap chunk ON DEVICE (sort + RLE, kernels/features.py §spill
    # pre-aggregation) so only unique (key, weight) runs cross the link —
    # the r4 raw-key spill shipped ~8 B/window D2H and collapsed to
    # ~1.05 us/window at soak scale. 'off' forces the raw-key spill
    # (kept for A/B; PANGAEA_SPILL_IMPL=raw|agg overrides at call time).
    spill_agg: str = "auto"
    # Windows aggregated per device chunk (sort operand size; ~6 ops x
    # 4 B through the three aggregation sorts).
    spill_agg_windows: int = 32 * 1024 * 1024
    # Where per-window run ids live between phase A and the replay:
    # 'device' (HBM-resident, zero per-window link traffic), 'host'
    # (host RAM, 4 B/window), 'disk' (bounded RSS: one chunk in memory
    # at a time, the rest in spill_dir files). 'auto' = disk when
    # spill_dir is set, else device until spill_device_budget bytes of
    # HBM are held, then host for the remainder.
    spill_store: str = "auto"
    spill_dir: Optional[str] = None
    spill_device_budget: int = 4 * 1024 * 1024 * 1024


@dataclass
class ModelConfig:
    """VAE + training knobs (reference: src/pangaea.py:144-152)."""

    latent_dim: int = 32
    hidden_sizes: tuple = (512, 512)
    lr: float = 0.005
    weight_decay: float = 1e-4
    epochs: int = 100
    batch_size: int = 2048
    dropout: float = 0.2
    patience: int = 20
    weight_alpha: float = 0.1   # wa/wt split (VAENET.py:21-22)
    weight_kl: float = 0.015    # w_kl (VAENET.py:20)
    # The reference constructs nn.LeakyReLU(True) (VAENET.py:205,217),
    # which sets negative_slope=1.0, i.e. the activation is the identity.
    # Kept as the default for parity; set to 0.01 for a real LeakyReLU.
    negative_slope: float = 1.0
    eval_every_batches: int = 100  # val pass cadence (VAENET.py:64)
    early_stop_delta: float = 1e-6  # (VAENET.py:36)
    val_fraction: float = 0.7       # test_size = min(0.7*N, 1e6) (pangaea.py:86)
    val_max: int = 1_000_000
    seed: int = 2021                # init_all(seed=2021) (pangaea.py:52)
    # matmul precision: 'float32' (reference numerics) or 'bfloat16'
    # (MXU bf16 with fp32 accumulation — params/BN/loss stay fp32).
    matmul_dtype: str = "float32"


@dataclass
class ClusterConfig:
    """RPH-KMeans knobs (reference: src/clustering.py:14-19 +
    third_parties/rph_kmeans/rph_kmeans/rph_kmeans_.py:12-15)."""

    n_clusters: Optional[int] = None  # -c; None => diversity-based auto-k
    n_init: int = 20                  # RPHKMeans(n_init=20) (clustering.py:17)
    max_point: int = 2000
    proj_num: int = 5
    max_iter: int = 1000
    sample_dist_num: int = 1000
    w: Optional[float] = None         # None => half median pairwise distance
    # final / skeleton KMeans
    kmeans_max_iter: int = 300
    kmeans_tol: float = 1e-4
    skeleton_n_init: int = 10         # sklearn KMeans default n_init
    # auto-k: k = int(8 * shannon_diversity) (clustering.py:100-101)
    diversity_multiplier: float = 8.0
    # Below this many latent-matrix elements the whole fit (reduce +
    # Lloyd x n_init) runs on the host CPU backend: each init costs
    # several dispatch+sync round trips of sub-millisecond math, and on a
    # tunneled TPU those round trips alone were ~10 s for a 3000x32
    # latent that CPU clusters in <1 s. The accelerator pays off when
    # the Lloyd matmuls carry real volume (~250k+ barcodes at latent 32).
    # PANGAEA_CLUSTER_DEVICE_MIN_ELEMS overrides at call time (debug A/B).
    device_min_elems: int = 8_000_000


@dataclass
class AssemblyConfig:
    """Step-4 knobs (reference: src/pangaea.py:163-164, clustering.py:132-164)."""

    low_abd_cut: str = "10,30"
    low_assembler: str = "megahit"    # or "spades"
    max_concurrent_bins: int = 5      # bin_assembly.sh:20-27
    max_concurrent_reassembly: int = 5  # clustering.py:156-159
    # extract_unmapped filters (extract_unmapped.cpp:142-144)
    min_aligned_columns: int = 60
    min_identity: float = 0.95
    # merge_olc (scripts/merge_olc.py:79-90)
    seed_min_len: int = 1000
    seed_copies: int = 6
    containment_slack: int = 1000
    flye_min_overlap: int = 1000
    # Lathe circularization (third_parties/Lathe/Snakefile:20-34)
    circularize_min_size: int = 1_700_000
    terminal_window: int = 50_000


@dataclass
class ParallelConfig:
    """TPU mesh / distribution knobs (greenfield — the reference is
    single-node CPU; see SURVEY.md §2.5)."""

    data_axis: str = "data"
    num_devices: Optional[int] = None  # None => all visible devices
    use_distributed: bool = False      # jax.distributed.initialize
    coordinator_address: Optional[str] = None
    num_processes: int = 1
    process_id: int = 0


@dataclass
class PangaeaConfig:
    # IO
    reads1: str = ""
    reads2: str = ""
    interleaved_reads: str = ""
    output: str = "pangaea_out"
    threads: int = 0  # 0 => os.cpu_count()

    # ensemble inputs (paths to external assembler outputs)
    spades: str = ""          # -sp seed/template contigs
    local_assembly: str = ""  # -lc athena local contigs (flye-input-contigs.fa)
    athena: str = ""          # -at athena.asm.fa
    metaphlan_db: str = ""

    steps: str = "1,2,3,4"

    feature: FeatureConfig = field(default_factory=FeatureConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    cluster: ClusterConfig = field(default_factory=ClusterConfig)
    assembly: AssemblyConfig = field(default_factory=AssemblyConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)

    def replace(self, **kw) -> "PangaeaConfig":
        return dataclasses.replace(self, **kw)
