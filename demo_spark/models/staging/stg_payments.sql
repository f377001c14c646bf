select
    id as payment_id,
    order_id,
    payment_method,
    -- cents to dollars, pinned to an exact decimal so downstream sums are
    -- order-independent
    cast(amount / 100.0 as decimal(16,2)) as amount
from {{ ref('raw_payments') }}
