from . import fasta, mrc, pdb  # noqa: F401
