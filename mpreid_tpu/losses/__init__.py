from .center import center_loss, init_centers
from .factory import make_loss
from .margin import (
    amsoftmax_logits,
    arcface_logits,
    circle_logits,
    contrastive_loss,
    cosface_logits,
)
from .softmax import (
    cross_entropy,
    cross_entropy_label_smooth,
    label_smoothing_cross_entropy,
)
from .supcon import supcon_loss
from .triplet import (
    cosine_dist,
    euclidean_dist,
    hard_example_mining,
    normalize,
    triplet_loss,
)
