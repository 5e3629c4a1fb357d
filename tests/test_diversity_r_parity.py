"""Formula-level parity fixture for the replaced R diversity stage.

The reference pipeline's auto-k path runs
``calculate_diversity.sh`` -> metaphlan -> ``metaphlan_tables.py``
(profile merged with ITSELF) -> ``calculate_diversity.R -d alpha -m
shannon`` (no ``-s``: taxon_separator defaults to **t__**) ->
``mat[2,1]`` (the duplicated second sample). R itself is not installed
here, so the oracle below is a line-for-line transliteration of the R
script's semantics (calculate_diversity.R:113-157,238-263 + the
microbiome package's ``diversity_shannon``: drop zeros, p = x/sum(x),
H = -sum(p ln p)), exercised on synthetic metaphlan4-style profiles and
compared against our `shannon_from_profile` / `merge_metaphlan_tables`.
"""

import math

import numpy as np
import pytest

from pangaea_tpu.asm.diversity import (merge_metaphlan_tables,
                                       shannon_from_profile)


def r_stage_oracle(merged_tsv_path: str, taxon_separator: str = "t__"):
    """Transliteration of calculate_diversity.R alpha/shannon.

    Returns the value the R script writes to *_shannon.txt (mat[2,1]:
    the SECOND sample column's diversity), or None where the R script
    would error (e.g. fewer than 2 sample columns after the zero-sum
    removal — mat[2,1] out of range).
    """
    # read.table(comment.char='#', header=TRUE, check.names=FALSE)
    lines = [l for l in open(merged_tsv_path).read().splitlines()
             if not l.startswith("#")]
    header = lines[0].split("\t")
    rows = [l.split("\t") for l in lines[1:]]
    ncbi_cols = [i for i, c in enumerate(header) if "ncbi" in c.lower()]
    # grep(taxon_separator, mpa_table[,1]) — substring match anywhere
    rows = [r for r in rows if taxon_separator in r[0]]
    sample_idx = [i for i in range(1, len(header)) if i not in ncbi_cols]
    cols = {i: np.array([float(r[i]) for r in rows]) for i in sample_idx}
    # remove samples with all unknowns (colSums == 0)
    kept = [i for i in sample_idx if cols[i].sum() != 0]
    if len(kept) < 2:
        return None
    # mpa_table <- mpa_table / 100 (cancels in shannon's normalization)
    x = cols[kept[1]] / 100.0       # mat[2,1] == second sample
    x = x[x > 0]                    # microbiome: ignore zeros
    if len(x) == 0:
        return None
    p = x / x.sum()
    return float(-(p * np.log(p)).sum())


def write_profile(path, rows, version="#mpa_vOct22_CHOCOPhlAnSGB_202212"):
    with open(path, "w") as f:
        f.write(version + "\n")
        f.write("#clade_name\tNCBI_tax_id\trelative_abundance\t"
                "additional_species\n")
        for clade, tax, abund in rows:
            f.write(f"{clade}\t{tax}\t{abund}\n")


MPA4_PROFILE = [
    # full metaphlan4-style multi-level profile: every level present;
    # only the t__ (SGB) rows count for the reference's default
    ("k__Bacteria", "2", "100.0"),
    ("k__Bacteria|p__Firmicutes", "2|1239", "62.0"),
    ("k__Bacteria|p__Proteobacteria", "2|1224", "38.0"),
    ("k__Bacteria|p__Firmicutes|c__Bacilli|o__Lactobacillales|"
     "f__Streptococcaceae|g__Streptococcus|s__Streptococcus_mutans",
     "2|1239|91061|186826|1300|1301|1309", "42.0"),
    ("k__Bacteria|p__Firmicutes|c__Bacilli|o__Lactobacillales|"
     "f__Streptococcaceae|g__Streptococcus|s__Streptococcus_mutans|"
     "t__SGB8047", "2|1239|91061|186826|1300|1301|1309|", "30.0"),
    ("k__Bacteria|p__Firmicutes|c__Bacilli|o__Lactobacillales|"
     "f__Streptococcaceae|g__Streptococcus|s__Streptococcus_mutans|"
     "t__SGB8048", "2|1239|91061|186826|1300|1301|1309|", "12.0"),
    ("k__Bacteria|p__Proteobacteria|c__Gammaproteobacteria|"
     "o__Enterobacterales|f__Enterobacteriaceae|g__Escherichia|"
     "s__Escherichia_coli", "2|1224|1236|91347|543|561|562", "38.0"),
    ("k__Bacteria|p__Proteobacteria|c__Gammaproteobacteria|"
     "o__Enterobacterales|f__Enterobacteriaceae|g__Escherichia|"
     "s__Escherichia_coli|t__SGB10068_group",
     "2|1224|1236|91347|543|561|562|", "38.0"),
]


def test_r_oracle_on_reference_flow(tmp_path):
    """Replicates the exact reference flow: profile merged with itself,
    R-stage oracle on the merged table == our direct computation."""
    profile = str(tmp_path / "profiled.txt")
    write_profile(profile, MPA4_PROFILE)
    merged = str(tmp_path / "profiles_table.tsv")
    merge_metaphlan_tables([profile, profile], merged)
    oracle = r_stage_oracle(merged)
    assert oracle is not None
    ours = shannon_from_profile(profile)
    assert math.isclose(ours, oracle, rel_tol=0, abs_tol=1e-12)
    # value check: t__ rows are 30/12/38 (NOT the s__ 42/38 split)
    p = np.array([30.0, 12.0, 38.0])
    p = p / p.sum()
    expected = float(-(p * np.log(p)).sum())
    assert math.isclose(ours, expected, abs_tol=1e-12)
    # and it differs from the s__-level value, so separator choice is
    # actually exercised
    ps = np.array([42.0, 38.0])
    ps = ps / ps.sum()
    assert not math.isclose(ours, float(-(ps * np.log(ps)).sum()),
                            abs_tol=1e-6)


def test_r_oracle_zero_abundance_rows_dropped(tmp_path):
    rows = MPA4_PROFILE + [
        ("k__Bacteria|p__X|c__Y|o__Z|f__W|g__V|s__U|t__SGB999",
         "2|", "0.0")]
    profile = str(tmp_path / "profiled.txt")
    write_profile(profile, rows)
    merged = str(tmp_path / "profiles_table.tsv")
    merge_metaphlan_tables([profile, profile], merged)
    assert math.isclose(shannon_from_profile(profile),
                        r_stage_oracle(merged), abs_tol=1e-12)


def test_r_oracle_random_sweep(tmp_path):
    rng = np.random.RandomState(3)
    for trial in range(25):
        n_sgb = rng.randint(1, 12)
        rows = [("k__Bacteria", "2", "100.0")]
        for i in range(n_sgb):
            ab = round(float(rng.rand() * 40), 5)
            rows.append((f"k__Bacteria|p__P|c__C|o__O|f__F|g__G|s__S{i}|"
                         f"t__SGB{i}", "2|", str(ab)))
        profile = str(tmp_path / f"profiled_{trial}.txt")
        write_profile(profile, rows)
        merged = str(tmp_path / f"merged_{trial}.tsv")
        merge_metaphlan_tables([profile, profile], merged)
        oracle = r_stage_oracle(merged)
        ours = shannon_from_profile(profile)
        if oracle is None:
            assert ours == 0.0
        else:
            assert math.isclose(ours, oracle, abs_tol=1e-12)


def test_metaphlan3_fallback_uses_species_rows(tmp_path):
    """Profiles with no t__ rows (metaphlan3) fall back to s__ — outside
    the reference contract but better than k=0; documented in
    shannon_from_profile."""
    rows = [r for r in MPA4_PROFILE if "t__" not in r[0]]
    profile = str(tmp_path / "profiled.txt")
    write_profile(profile, rows)
    ps = np.array([42.0, 38.0])
    ps = ps / ps.sum()
    assert math.isclose(shannon_from_profile(profile),
                        float(-(ps * np.log(ps)).sum()), abs_tol=1e-12)


def test_alpha_metrics_match_formula_oracles():
    """richness / shannon / simpson / gini against independent
    transliterations of microbiome::alpha's formulas
    (calculate_diversity.R:238-259)."""
    from pangaea_tpu.asm.diversity import alpha_diversity
    rng = np.random.RandomState(4)
    for _ in range(20):
        x = rng.rand(rng.randint(2, 15)) * 30
        x[rng.rand(len(x)) < 0.2] = 0.0
        xs = x[x > 0]
        if len(xs) == 0:
            continue
        p = xs / xs.sum()
        assert alpha_diversity(x, "richness") == len(xs)
        assert math.isclose(alpha_diversity(x, "shannon"),
                            float(-(p * np.log(p)).sum()), abs_tol=1e-12)
        assert math.isclose(alpha_diversity(x, "simpson"),
                            float(1 - (p ** 2).sum()), abs_tol=1e-12)
        # standard Gini coefficient (microbiome::inequality)
        s = np.sort(xs)
        n = len(s)
        gini = (2 * np.sum(np.arange(1, n + 1) * s) / (n * s.sum())
                - (n + 1) / n)
        assert math.isclose(alpha_diversity(x, "gini"), float(gini),
                            abs_tol=1e-12)


def test_beta_metrics_match_formula_oracles():
    """bray-curtis / jaccard / aitchison against rbiom::beta.div's
    definitions (calculate_diversity.R:161-236); the /100 table rescale
    cancels in aitchison (clr shift-invariance)."""
    from pangaea_tpu.asm.diversity import beta_diversity, clr_transform
    rng = np.random.RandomState(6)
    for _ in range(20):
        n = rng.randint(3, 12)
        a = rng.rand(n) * 20
        b = rng.rand(n) * 20
        bc = float(np.abs(a - b).sum() / (a + b).sum())
        assert math.isclose(beta_diversity(a, b, "bray-curtis"), bc,
                            abs_tol=1e-12)
        both = int(((a > 0) & (b > 0)).sum())
        either = int(((a > 0) | (b > 0)).sum())
        assert math.isclose(beta_diversity(a, b, "jaccard"),
                            1 - both / either, abs_tol=1e-12)
        ca = np.log(a) - np.log(a).mean()
        cb = np.log(b) - np.log(b).mean()
        ait = float(np.sqrt(((ca - cb) ** 2).sum()))
        assert math.isclose(beta_diversity(a, b, "aitchison"), ait,
                            rel_tol=1e-12)
        # scale invariance of aitchison under the /100 rescale
        assert math.isclose(beta_diversity(a / 100, b / 100, "aitchison"),
                            ait, rel_tol=1e-9)
    # clr zero handling mirrors R (no zero replacement): -inf mean
    out = clr_transform([1.0, 0.0, 2.0])
    assert math.isinf(out[0]) and out[0] > 0
    assert math.isnan(out[1])


# ---- unifrac (calculate_diversity.R:173-222) ------------------------------


def test_newick_parser_roundtrip_semantics():
    from pangaea_tpu.asm.diversity import read_newick
    t = read_newick("((A:1,B:2)ab:0.5,(C:3,'D d':1):0.25)root;")
    assert sorted(t.tip_labels()) == ["A", "B", "C", "D d"]
    ab = t.children[0]
    assert ab.name == "ab" and ab.length == 0.5
    assert t.name == "root" and t.length is None
    assert [c.length for c in ab.children] == [1.0, 2.0]
    with pytest.raises(ValueError):
        read_newick("((A:1,B:2;")


def test_unifrac_hand_computed_fixture():
    """Branch-by-branch hand computation on a 4-tip tree.

    Edges: A:1 B:2 (AB):0.5 C:3 D:1 (CD):0.25. X=[10,0,5,5],
    Y=[0,10,10,0] (totals 20 each). Weighted: 1*.5 + 2*.5 + 0 + 3*.25
    + 1*.25 + 0 = 2.5. Unweighted: presence differs on A,B,D
    (1+2+1=4); union = all 7.75."""
    from pangaea_tpu.asm.diversity import read_newick, unifrac
    tree = read_newick("((A:1,B:2):0.5,(C:3,D:1):0.25);")
    rows = ["A", "B", "C", "D"]
    x = [10.0, 0.0, 5.0, 5.0]
    y = [0.0, 10.0, 10.0, 0.0]
    assert math.isclose(unifrac(rows, x, y, tree, weighted=True), 2.5,
                        abs_tol=1e-12)
    assert math.isclose(unifrac(rows, x, y, tree, weighted=False),
                        4.0 / 7.75, abs_tol=1e-12)


def test_keep_tip_collapses_singles_and_reroots_at_mrca():
    """ape::keep.tip semantics: dropped tips collapse their parent
    chain with branch lengths SUMMED; edges above the kept tips' MRCA
    are discarded (collapse.singles root.edge=FALSE)."""
    from pangaea_tpu.asm.diversity import keep_tip, read_newick, unifrac
    # E and F pruned: (A:1 under :2) -> A:3; (C:3 under :1) -> C:4
    tree = read_newick("(((A:1,E:4):2,B:2):0.5,(C:3,F:7):1);")
    rows = ["A", "B", "C"]
    x = [1.0, 1.0, 2.0]
    y = [0.0, 2.0, 2.0]
    # edges after keep.tip: A:3 B:2 (AB):0.5 C:4
    # weighted: 3*|.25-0| + 2*|.25-.5| + .5*0 + 4*0 = 1.25
    # unweighted: differs only on A (3) / union 9.5
    assert math.isclose(unifrac(rows, x, y, tree, weighted=True), 1.25,
                        abs_tol=1e-12)
    assert math.isclose(unifrac(rows, x, y, tree, weighted=False),
                        3.0 / 9.5, abs_tol=1e-12)
    # keeping one clade re-roots at its MRCA: the 0.5 edge above the
    # (A,B) ancestor must vanish from the union denominator
    pruned = keep_tip(read_newick("((A:1,B:2):0.5,C:3);"), ["A", "B"])
    assert pruned.length is None
    assert sorted(pruned.tip_labels()) == ["A", "B"]
    t2 = read_newick("((A:1,B:2):0.5,C:3);")
    assert math.isclose(
        unifrac(["A", "B"], [1.0, 0.0], [0.0, 1.0], t2, weighted=False),
        1.0, abs_tol=1e-12)
    assert math.isclose(
        unifrac(["A", "B"], [1.0, 0.0], [0.0, 1.0], t2, weighted=True),
        3.0, abs_tol=1e-12)


def test_unifrac_star_tree_degenerates_to_l1_and_weighted_jaccard():
    """On a star tree, weighted unifrac IS the L1 distance of the
    normalized columns, and unweighted unifrac IS branch-length-
    weighted presence mismatch over the union — independent closed
    forms that pin the edge accumulation."""
    from pangaea_tpu.asm.diversity import read_newick, unifrac
    rng = np.random.RandomState(11)
    for _ in range(10):
        n = rng.randint(3, 9)
        rows = [f"S{i}" for i in range(n)]
        lens = rng.rand(n) * 5 + 0.1
        tree = read_newick(
            "(" + ",".join(f"{r}:{l}" for r, l in zip(rows, lens)) + ");")
        a = rng.rand(n) * 10 * (rng.rand(n) > 0.3)
        b = rng.rand(n) * 10 * (rng.rand(n) > 0.3)
        if a.sum() == 0 or b.sum() == 0:
            continue
        w = unifrac(rows, a, b, tree, weighted=True)
        assert math.isclose(
            w, float(np.abs(a / a.sum() - b / b.sum()) @ lens),
            rel_tol=1e-12)
        differ = float(lens @ ((a > 0) != (b > 0)))
        either = float(lens @ ((a > 0) | (b > 0)))
        u = unifrac(rows, a, b, tree, weighted=False)
        assert math.isclose(u, differ / either, rel_tol=1e-12)


def test_unifrac_random_sweep_vs_leafset_oracle():
    """Random binary trees + abundance columns (with zeros and species
    missing from the tree) against an independent edge-enumeration
    oracle that materializes every edge's descendant leaf set."""
    from pangaea_tpu.asm.diversity import keep_tip, read_newick, unifrac

    def rand_tree(rng, labels):
        if len(labels) == 1:
            return f"{labels[0]}:{rng.rand() * 4 + 0.05:.4f}"
        k = rng.randint(1, len(labels))
        left = rand_tree(rng, labels[:k])
        right = rand_tree(rng, labels[k:])
        return f"({left},{right}):{rng.rand() * 4 + 0.05:.4f}"

    def oracle(rows, ca, cb, tree, weighted):
        tips = set(tree.tip_labels())
        kept = [r for r in rows if r in tips]
        pruned = keep_tip(tree, kept)
        abund = {r: (a, b) for r, a, b in zip(rows, ca, cb) if r in tips}
        edges = []

        def collect(n):
            for c in n.children:
                edges.append((frozenset(c.tip_labels()), c.length or 0.0))
                collect(c)

        collect(pruned)
        ta = sum(a for a, _ in abund.values())
        tb = sum(b for _, b in abund.values())
        if weighted:
            return sum(
                l * abs(sum(abund[r][0] for r in s) / ta
                        - sum(abund[r][1] for r in s) / tb)
                for s, l in edges)
        num = sum(l for s, l in edges
                  if (sum(abund[r][0] for r in s) > 0)
                  != (sum(abund[r][1] for r in s) > 0))
        den = sum(l for s, l in edges
                  if sum(abund[r][0] for r in s) > 0
                  or sum(abund[r][1] for r in s) > 0)
        return num / den if den else 0.0

    rng = np.random.RandomState(23)
    for trial in range(25):
        n = rng.randint(4, 14)
        labels = [f"T{i}" for i in range(n)]
        tree_text = "(" + rand_tree(rng, labels[: n // 2]) + "," + \
            rand_tree(rng, labels[n // 2:]) + ");"
        tree = read_newick(tree_text)
        # table rows: a subset of tree tips plus some species the tree
        # lacks (the R script's *_species.log removal set)
        rows = [l for l in labels if rng.rand() > 0.2] + ["X1", "X2"]
        if sum(r in labels for r in rows) < 2:
            continue
        a = rng.rand(len(rows)) * 10 * (rng.rand(len(rows)) > 0.3)
        b = rng.rand(len(rows)) * 10 * (rng.rand(len(rows)) > 0.3)
        in_tree = [i for i, r in enumerate(rows) if r in labels]
        if (sum(a[i] for i in in_tree) == 0
                or sum(b[i] for i in in_tree) == 0):
            continue
        for weighted in (True, False):
            got = unifrac(rows, a, b, tree, weighted)
            want = oracle(rows, a, b, read_newick(tree_text), weighted)
            assert math.isclose(got, want, rel_tol=1e-10), \
                (trial, weighted, got, want)


def test_unifrac_error_surface_matches_r_removals():
    """Zero-sum samples and all-missing profiles are removed/errored by
    the R script before the distance exists; the port surfaces both."""
    from pangaea_tpu.asm.diversity import keep_tip, read_newick, unifrac
    tree = read_newick("((A:1,B:2):0.5,C:3);")
    with pytest.raises(ValueError):
        unifrac(["A", "B", "C"], [0.0, 0.0, 0.0], [1.0, 1.0, 1.0],
                tree, weighted=True)
    with pytest.raises(ValueError):
        unifrac(["Q", "R"], [1.0, 1.0], [1.0, 1.0], tree, weighted=True)
    with pytest.raises(ValueError):
        keep_tip(tree, ["A"])


def test_unifrac_deep_ladder_tree_beyond_recursion_limit():
    """MetaPhlAn species trees nest far deeper than Python's recursion
    limit; parser, keep.tip and the unifrac walk must be iterative."""
    from pangaea_tpu.asm.diversity import read_newick, unifrac
    depth = 5000
    # pectinate ladder: (((...(T0:1,T1:1):1,T2:1):1,...,Tn:1);
    text = "(T0:1,T1:1)"
    for i in range(2, depth):
        text = f"({text}:1,T{i}:1)"
    tree = read_newick(text + ";")
    rows = [f"T{i}" for i in range(depth)]
    assert sorted(tree.tip_labels()) == sorted(rows)
    a = [1.0] + [0.0] * (depth - 1)
    b = [0.0] * (depth - 1) + [1.0]
    # weighted: T0's tip edge (1) + every internal edge between T0 and
    # the root (depth-2 edges of length 1, each |1-0|) + T_{n-1}'s tip
    # edge = 1 + (depth-2) + 1
    w = unifrac(rows, a, b, tree, weighted=True)
    assert math.isclose(w, float(depth), abs_tol=1e-9)
    u = unifrac(rows, a, b, tree, weighted=False)
    # every edge carries exactly one of the two samples: union == all
    # edges, differ == all edges
    assert math.isclose(u, 1.0, abs_tol=1e-12)
