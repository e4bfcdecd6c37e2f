from . import alphabets, packing, extractor
