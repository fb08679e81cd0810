from . import data, evaluator, flatten, graph, nodes, rtvs, sanitize, transform
