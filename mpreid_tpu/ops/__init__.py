from .distmat import cosine_distmat, euclidean_squared_distmat
from .metrics import cmc_map
from .reranking import re_ranking
from .reranking_numpy import re_ranking_numpy
