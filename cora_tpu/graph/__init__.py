from cora_tpu.graph.problem import Problem  # noqa: F401
