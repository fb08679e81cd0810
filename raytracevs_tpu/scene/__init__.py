from . import commands, data, evaluator, flatten, graph, nodes, rtvs, sanitize, transform
