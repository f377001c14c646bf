{% snapshot accounts_snapshot %}
{{ config(unique_key='account_id', strategy='check') }}
select * from {{ ref('stg_accounts') }}
{% endsnapshot %}
