from hsg_tpu.ops import common
from hsg_tpu.ops import segment
from hsg_tpu.ops import kmeans
