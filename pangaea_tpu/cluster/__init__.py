"""Clustering layer: TPU-native RPH-KMeans (reference: third_parties/rph_kmeans)."""

from pangaea_tpu.cluster.reduce import RPPointReducer
from pangaea_tpu.cluster.kmeans import kmeans_lloyd, kmeans_inertia
from pangaea_tpu.cluster.rph import RPHKMeans, clustering_rph_kmeans
from pangaea_tpu.cluster.k_selection import select_k_with_bic, cal_bic

__all__ = ["RPPointReducer", "kmeans_lloyd", "kmeans_inertia", "RPHKMeans",
           "clustering_rph_kmeans", "select_k_with_bic", "cal_bic"]
