from hama_spark.graph.diameter import effective_diameter, neighborhood_function, reachability_counts
from hama_spark.graph.scc import strongly_connected_components
from hama_spark.graph.hits import hits
from hama_spark.graph.centrality import harmonic_centrality
from hama_spark.graph.betweenness import betweenness_centrality
from hama_spark.graph.cc_twophase import connected_components_twophase
from hama_spark.graph.components import mindist_search
from hama_spark.graph.degrees import degree_histogram
from hama_spark.graph.dynamic import dynamic_sum
from hama_spark.graph.inlink import inlink_count
from hama_spark.graph.kcore import kcore
from hama_spark.graph.labelprop import label_propagation
from hama_spark.graph.linkpred import link_prediction
from hama_spark.graph.matching import bipartite_matching
from hama_spark.graph.pagerank import pagerank
from hama_spark.graph.semiclustering import semi_clustering
from hama_spark.graph.sssp import sssp
from hama_spark.graph.triangles import triangle_count
from hama_spark.graph.walks import random_walks
from hama_spark.graph.features import aggregate_neighbors, propagate_features

__all__ = [
    "hits",
    "harmonic_centrality",
    "betweenness_centrality",
    "inlink_count",
    "sssp",
    "mindist_search",
    "connected_components_twophase",
    "pagerank",
    "dynamic_sum",
    "kcore",
    "bipartite_matching",
    "semi_clustering",
    "triangle_count",
    "degree_histogram",
    "label_propagation",
    "random_walks",
    "aggregate_neighbors",
    "propagate_features",
]
