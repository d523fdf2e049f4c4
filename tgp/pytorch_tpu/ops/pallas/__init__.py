from .rbf_gram import rbf_gram_pallas, pallas_available
