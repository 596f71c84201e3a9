"""Pure numpy scalar/vector functions: drift statistics, p-values, severity,
text kernels. No Ray dependency — used inside ``map_batches`` bodies and on
the driver for merged-sketch scoring."""
