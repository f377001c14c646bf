with customer_orders as (
    select
        customer_id,
        min(order_date) as first_order,
        max(order_date) as most_recent_order,
        count(*) as number_of_orders
    from {{ ref('stg_orders') }}
    group by customer_id
),

customer_spend as (
    select
        o.customer_id,
        sum(p.amount) as customer_lifetime_value
    from {{ ref('stg_orders') }} o
    join {{ ref('stg_payments') }} p on p.order_id = o.order_id
    group by o.customer_id
)

select
    c.customer_id,
    cast(c.first_name as varchar(256)) as first_name,
    c.last_name,
    co.first_order,
    co.most_recent_order,
    coalesce(co.number_of_orders, 0) as number_of_orders,
    cast(coalesce(s.customer_lifetime_value, 0) as decimal(16,2))
        as customer_lifetime_value
from {{ ref('stg_customers') }} c
left join customer_orders co on co.customer_id = c.customer_id
left join customer_spend s on s.customer_id = c.customer_id
