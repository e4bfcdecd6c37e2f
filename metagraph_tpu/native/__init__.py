from .loader import fasta_encode_native, native_available
