from .dates import minguo_to_date, minguo_to_iso, to_valid_date
from .geo import CITY_CODE_MAP, city_code_from_filename, city_from_code
from .numeric import M2_PER_PING, dec_avg, dec_sum, m2_to_ping, ping_price_from_m2

__all__ = [
    "minguo_to_date",
    "minguo_to_iso",
    "to_valid_date",
    "CITY_CODE_MAP",
    "city_code_from_filename",
    "city_from_code",
    "M2_PER_PING",
    "dec_avg",
    "dec_sum",
    "m2_to_ping",
    "ping_price_from_m2",
]
