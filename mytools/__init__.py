"""Reference-convention helper scripts (ref: /root/reference/mytools/).

Importable both from a repo checkout (``from mytools.vis_3d import ...``)
and from an installed das-tpu wheel (packaged via pyproject
``include = ["das_tpu*", "mytools*"]``).
"""
