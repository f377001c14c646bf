select
    case when total_amount >= 400 then 'large'
         when total_amount >= 150 then 'medium'
         else 'small' end as size_band,
    count(*) as n_orders,
    sum(n_payments) as n_payments
from {{ ref('order_totals') }}
group by 1
