with p as (
    select * from {{ ref('stg_payments') }} where status = 'settled'
)
select a.account_id,
       a.holder,
       a.region,
       count(p.payment_id) as n_payments,
       sum(p.amount) as revenue
from {{ ref('stg_accounts') }} a
left join p using (account_id)
group by all
