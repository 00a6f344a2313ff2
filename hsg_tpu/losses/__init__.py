from hsg_tpu.losses import segsort
from hsg_tpu.losses import graph
