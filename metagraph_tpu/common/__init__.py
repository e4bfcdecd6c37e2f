from . import packed, ranksel
