from . import analysis  # offline forecast/climate analysis (numpy-only)
