from montecarlopagerank_spark.algos.pagerank_power import pagerank_power  # noqa: F401
from montecarlopagerank_spark.algos.pagerank_mc import pagerank_monte_carlo  # noqa: F401
from montecarlopagerank_spark.algos.components import connected_components  # noqa: F401
from montecarlopagerank_spark.algos.labelprop import label_propagation  # noqa: F401
from montecarlopagerank_spark.algos.triangles import triangle_count  # noqa: F401
